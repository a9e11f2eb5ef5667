"""Orbax checkpointing keyed on min ``val_wWAPE``.

Replaces Lightning's ``ModelCheckpoint(monitor="val_wWAPE", mode="min",
save_top_k=2)`` (``/root/reference/train_dl.py:151-157``; top-k 1 for the
GTM family, ``train_GTM_visuelle2.py:119-125``).  Saves params + batch_stats
+ opt_state + step so mid-training resume works (the reference never wires
``ckpt_path=`` into ``fit`` — we support it).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import orbax.checkpoint as ocp


def resolve_ckpt_path(path: str):
    """Accept either a manager root directory or a specific step directory
    (what ``best_model_path`` returns / the trainer prints): returns
    ``(root, step_or_None)``."""
    path = os.path.abspath(path)
    base = os.path.basename(path)
    if base.isdigit():
        return os.path.dirname(path), int(base)
    return path, None


class CheckpointManager:
    def __init__(self, directory: str, *, save_top_k: int = 2,
                 monitor: str = "val_wWAPE", mode: str = "min"):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.monitor = monitor
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k,
            best_fn=lambda m: m[monitor],
            best_mode=mode,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)
        self.directory = directory

    def save(self, epoch: int, state, metrics: Dict[str, float]):
        payload = {
            "params": state.params,
            "batch_stats": dict(state.batch_stats) if state.batch_stats else {},
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(
            epoch, args=ocp.args.StandardSave(payload),
            metrics={k: float(v) for k, v in metrics.items() if k != "epoch"})
        self._mgr.wait_until_finished()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def latest_step(self) -> Optional[int]:
        """Most recent saved epoch — what mid-training resume should restore
        (best_step would silently rewind to an earlier epoch)."""
        return self._mgr.latest_step()

    @property
    def best_model_path(self) -> Optional[str]:
        step = self.best_step()
        return None if step is None else os.path.join(self.directory, str(step))

    def restore(self, state, step: Optional[int] = None):
        """Restore into an existing TrainState template (shapes/dtypes)."""
        step = step if step is not None else self.best_step()
        template = {
            "params": state.params,
            "batch_stats": dict(state.batch_stats) if state.batch_stats else {},
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(
            params=restored["params"],
            batch_stats=type(state.batch_stats)(restored["batch_stats"])
            if state.batch_stats else state.batch_stats,
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def restore_for_eval(self, state, step: Optional[int] = None):
        """Restore params + batch_stats only (inference / forecast CLIs).

        A full ``restore`` needs the template's opt_state structure to match
        the one saved at train time (e.g. the transformer family's grad-clip
        chain); at forecast time the optimizer config isn't known, so we do a
        partial restore that omits opt_state/step entirely."""
        step = step if step is not None else self.best_step()
        template = {"params": state.params}
        if state.batch_stats:
            template["batch_stats"] = dict(state.batch_stats)
        restored = self._mgr.restore(
            step, args=ocp.args.PyTreeRestore(template, partial_restore=True))
        return state.replace(
            params=restored["params"],
            batch_stats=type(state.batch_stats)(restored["batch_stats"])
            if state.batch_stats else state.batch_stats,
        )

    def close(self):
        self._mgr.close()
