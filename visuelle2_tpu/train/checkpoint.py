"""Orbax checkpointing keyed on min ``val_wWAPE``.

Replaces Lightning's ``ModelCheckpoint(monitor="val_wWAPE", mode="min",
save_top_k=2)`` (``/root/reference/train_dl.py:151-157``; top-k 1 for the
GTM family, ``train_GTM_visuelle2.py:119-125``).  Saves params + batch_stats
+ opt_state + step so mid-training resume works (the reference never wires
``ckpt_path=`` into ``fit`` — we support it).

Beyond the reference: a ``last`` slot (Lightning's ``save_last=True``
analogue).  The top-k retention keeps only the BEST epochs — once the
monitor stops improving, the newest epochs are garbage-collected, and a
resume from ``latest_step()`` would silently rewind past them, retraining
epochs that already ran.  The ``last`` slot is a separate single-entry
manager under ``<dir>/last`` that always holds the most recent state plus
the epoch the next ``fit`` should start at (``fit_epoch``); it is also the
landing place for preemption saves (``save_preempted``), which may capture a
MID-epoch state — their ``fit_epoch`` points back at the interrupted epoch
and ``fit_skip`` records how many of its optimizer steps the state already
contains, so the resumed run continues at the exact next step.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
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


def _payload(state):
    return {
        "params": state.params,
        "batch_stats": dict(state.batch_stats) if state.batch_stats else {},
        "opt_state": state.opt_state,
        "step": state.step,
    }


class CheckpointManager:
    def __init__(self, directory: str, *, save_top_k: int = 2,
                 monitor: str = "val_wWAPE", mode: str = "min",
                 save_last: bool = True, read_only: bool = False):
        """``read_only=True`` for restore-only flows (forecast/export/serve
        CLIs, resume sources): nothing is created or mutated — an archived
        checkpoint on a read-only mount restores fine, and shipped artifact
        directories don't grow empty ``last/`` subtrees.  Raises
        FileNotFoundError when the directory doesn't exist."""
        directory = os.path.abspath(directory)
        self.read_only = bool(read_only)
        if read_only:
            if not os.path.isdir(directory):
                raise FileNotFoundError(
                    f"{directory}: no such checkpoint directory")
        else:
            os.makedirs(directory, exist_ok=True)
        self.monitor = monitor
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k,
            best_fn=lambda m: m[monitor],
            best_mode=mode,
            read_only=read_only,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)
        self.directory = directory
        self._last = None
        last_dir = os.path.join(directory, "last")
        if save_last and (not read_only or os.path.isdir(last_dir)):
            self._last = ocp.CheckpointManager(
                last_dir, options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, read_only=read_only))

    def _save_last(self, state, fit_epoch: int, fit_skip: int = 0):
        payload = dict(_payload(state), fit_epoch=np.asarray(fit_epoch, np.int32),
                       fit_skip=np.asarray(fit_skip, np.int32))
        # Keyed by a monotonic SAVE COUNTER, not the epoch or train step:
        # orbax silently skips (or, forced, refuses) a save whose key
        # already exists, and both epoch keys (every mid-epoch autosave
        # after the first) and step keys (an autosave at an epoch's final
        # step vs the epoch-complete save) collide.  A fresh key per save
        # also keeps the slot crash-safe: the previous checkpoint is
        # garbage-collected only AFTER the new one commits, so a hard kill
        # mid-save never leaves the slot empty (delete-then-rewrite would).
        prev = self._last.latest_step()
        key = 0 if prev is None else prev + 1
        self._last.save(key, args=ocp.args.StandardSave(payload))

    def save(self, epoch: int, state, metrics: Dict[str, float]):
        """Async epoch save: returns once the state is copied OUT of the
        (donated) training buffers; the disk commit proceeds in the
        background, overlapping the next epoch's training (measured 5-16 s
        blocked per epoch at ResNet-101 scale otherwise).  Orbax itself
        serializes back-to-back saves on one manager, and every read path
        below drains first — the only semantic change is that a hard kill
        in the seconds after save() returns can lose THAT epoch's save
        (the previously committed one survives; preemption/autosave saves
        stay fully blocking because the process may exit right after)."""
        if self.read_only:  # orbax would silently no-op the save
            raise ValueError("CheckpointManager is read_only")
        self._mgr.save(
            epoch, args=ocp.args.StandardSave(_payload(state)),
            metrics={k: float(v) for k, v in metrics.items() if k != "epoch"})
        if self._last is not None:
            self._save_last(state, fit_epoch=epoch + 1)

    def wait_until_finished(self):
        """Drain in-flight async saves (both managers)."""
        self._mgr.wait_until_finished()
        if self._last is not None:
            self._last.wait_until_finished()

    def save_preempted(self, epoch: int, state, steps_into_epoch: int = 0):
        """Emergency save at a STEP boundary inside ``epoch`` (graceful
        SIGTERM shutdown, or the periodic ``autosave_minutes`` tick — both
        train/loop.py).  Lands only in the ``last`` slot — it has no
        validation metrics, so it must never compete with the top-k best
        checkpoints — with ``fit_epoch`` pointing back at the interrupted
        epoch and ``fit_skip`` recording how many optimizer steps of it are
        already inside the state: the resumed run skips exactly those and
        reproduces the uninterrupted run (the loader's epoch order is
        (seed, epoch)-deterministic via ``set_epoch`` and the rng stream is
        step-folded)."""
        if self._last is None:
            raise ValueError("save_preempted requires save_last=True")
        if self.read_only:
            raise ValueError("CheckpointManager is read_only")
        self._save_last(state, fit_epoch=epoch, fit_skip=steps_into_epoch)
        # Fully durable before returning: the caller may exit(143) next.
        self._last.wait_until_finished()

    def best_step(self) -> Optional[int]:
        self.wait_until_finished()
        return self._mgr.best_step()

    def best_metric(self) -> Optional[Tuple[int, float]]:
        """(best_epoch, monitor value at it), or None when nothing saved.

        Lets a resumed ``fit`` rebuild its early-stopping bookkeeping (the
        best-so-far monitor and how many epochs ago it happened) instead of
        resetting it — the best epoch always survives the top-k GC."""
        self.wait_until_finished()
        step = self._mgr.best_step()
        if step is None:
            return None
        metrics = self._mgr.metrics(step)
        if metrics is None or self.monitor not in metrics:
            return None
        return step, float(metrics[self.monitor])

    def latest_step(self) -> Optional[int]:
        """Key of the most recent resumable save: the last slot's save
        counter when present (authoritative — the top-k retention may have
        garbage-collected every epoch after the best one), else the newest
        surviving top-k EPOCH.  Use ``restore_latest`` for resume — it
        reads the recorded ``fit_epoch``/``fit_skip`` instead of
        interpreting this key."""
        self.wait_until_finished()
        if self._last is not None:
            step = self._last.latest_step()
            if step is not None:
                return step
        return self._mgr.latest_step()

    @property
    def best_model_path(self) -> Optional[str]:
        step = self.best_step()
        return None if step is None else os.path.join(self.directory, str(step))

    @staticmethod
    def _apply(state, restored):
        return state.replace(
            params=restored["params"],
            batch_stats=type(state.batch_stats)(restored["batch_stats"])
            if state.batch_stats else state.batch_stats,
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def restore(self, state, step: Optional[int] = None):
        """Restore into an existing TrainState template (shapes/dtypes)."""
        self.wait_until_finished()
        step = step if step is not None else self.best_step()
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_payload(state)))
        return self._apply(state, restored)

    def restore_latest(self, state) -> Tuple[object, int, int]:
        """Restore the most recent state for mid-training resume.

        Returns ``(state, start_epoch, skip_steps)``: resume training at
        ``start_epoch``, skipping its first ``skip_steps`` optimizer steps
        (non-zero only for mid-epoch preemption/autosave saves — those
        steps are already inside the state, and skipping them makes the
        resumed run reproduce the uninterrupted one).  Prefers the ``last``
        slot (true latest — the top-k retention may have deleted every
        epoch after the best one); falls back to the newest SURVIVING
        top-k checkpoint for pre-``save_last`` directory layouts."""
        self.wait_until_finished()
        if self._last is not None:
            step = self._last.latest_step()
            if step is not None:
                template = dict(_payload(state),
                                fit_epoch=np.asarray(0, np.int32),
                                fit_skip=np.asarray(0, np.int32))
                try:
                    restored = self._last.restore(
                        step, args=ocp.args.StandardRestore(template))
                except ValueError as first:
                    # Last slot written before ``fit_skip`` existed: orbax
                    # rejects a template key the on-disk tree lacks.  Retry
                    # without it; those saves were epoch-complete or
                    # re-run-the-epoch preemption saves, i.e. skip 0.  Chain
                    # the original error so a GENUINE template/checkpoint
                    # mismatch (different model/optimizer config) isn't
                    # hidden behind a misleading second failure.
                    template.pop("fit_skip")
                    try:
                        restored = self._last.restore(
                            step, args=ocp.args.StandardRestore(template))
                    except ValueError:
                        raise first from None
                    restored["fit_skip"] = 0
                return (self._apply(state, restored),
                        int(restored["fit_epoch"]),
                        int(restored["fit_skip"]))
        step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"{self.directory}: no checkpoints to resume from")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_payload(state)))
        return self._apply(state, restored), step + 1, 0

    def restore_for_eval(self, state, step: Optional[int] = None):
        """Restore params + batch_stats only (inference / forecast CLIs).

        A full ``restore`` needs the template's opt_state structure to match
        the one saved at train time (e.g. the transformer family's grad-clip
        chain); at forecast time the optimizer config isn't known, so we do a
        partial restore that omits opt_state/step entirely."""
        self.wait_until_finished()
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
        if self._last is not None:
            self._last.close()
