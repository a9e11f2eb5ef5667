"""Training + evaluation loops.

Replaces the reference's PyTorch-Lightning harness (``pl.Trainer`` with
per-epoch validation and a ``val_wWAPE``-monitored checkpoint,
``/root/reference/train_dl.py:151-175``) with an explicit jit-compiled loop:

* one compiled ``train_step`` (value_and_grad + Adafactor update + BatchNorm
  stat update), donated state, batch sharded over the mesh's ``data`` axis;
* one compiled ``eval_step`` returning *partial metric sums* that accumulate
  exactly across batches and reduce across devices — the whole test split
  scores in one pass of compiled steps (SURVEY.md §7.8);
* per-epoch ``val_wWAPE``/``val_mae`` computed from the sums (definitions at
  ``CrossAttnRNN21.py:236-241``) and orbax checkpointing keyed on min
  ``val_wWAPE``.

Loss matches the reference: plain MSE between (window-flattened) targets and
forecasts (``CrossAttnRNN210.py:247``, ``GTM_Visuelle2.py:278``).
"""

from __future__ import annotations

import dataclasses
import signal
import threading
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import core, struct

from visuelle2_tpu.data.loader import BatchLoader
from visuelle2_tpu.ops.metrics import eval_metrics, finalize_metrics
from visuelle2_tpu.parallel.distributed import global_batch
from visuelle2_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    stacked_batch_sharding,
)
from visuelle2_tpu.parallel.sharding import infer_param_sharding
from visuelle2_tpu.train import optim as optim_lib


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any
    tx: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=jax.tree_util.tree_map(lambda p, u: p + u, self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def target_and_pred(batch, forecast):
    """Align target with a model forecast (both -> [N, H]).

    stfore: y [B, W, H] -> [B·W, H]; demand: ts [B, 12]; forecasts of
    trailing singleton dims are squeezed (CrossAttnRNNDemand returns
    [N, 12, 1], :415).
    """
    if "y" in batch and batch.get("X") is not None:
        y = batch["y"]
        target = y.reshape(-1, y.shape[-1])
    else:
        target = batch["ts"]
    f = forecast
    if f.ndim == 3 and f.shape[-1] == 1 and target.ndim == 2:
        f = f[..., 0]
    return target, f.reshape(target.shape)


def expand_mask(batch, target):
    """Per-item mask -> per-row mask matching the flattened window axis."""
    mask = batch.get("mask")
    if mask is None:
        return jnp.ones((target.shape[0],), target.dtype)
    reps = target.shape[0] // mask.shape[0]
    return jnp.repeat(mask, reps, axis=0) if reps > 1 else mask


def mse_loss(target, pred, row_mask):
    err = (target - pred) ** 2
    denom = jnp.maximum(row_mask.sum() * target.shape[-1], 1.0)
    return jnp.sum(err * row_mask[:, None]) / denom


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 50              # train_dl.py:203
    batch_size: int = 128         # train_dl.py:191
    seed: int = 21                # train_dl.py:190
    grad_clip: Optional[float] = None  # 0.5 for the transformer family
    learning_rate: Any = None  # None = fairseq relative-step schedule
    ckpt_dir: Optional[str] = None
    norm_scalar: float = 53.0
    data_parallel: bool = True
    # Tensor parallelism: kernels with a trailing dim >= tp_min_dim (and
    # divisible by the mesh's model axis) are column-sharded over ``model``
    # (parallel/sharding.py); the default matches real model dims, tests
    # lower it to shard tiny configs.
    tp_min_dim: int = 64
    # When set, capture a jax.profiler device trace of one steady-state
    # train step (the second step, after compilation) into this directory
    # (viewable in TensorBoard/Perfetto; utils/tracing.py).
    trace_dir: Optional[str] = None
    # Gradient accumulation (pl.Trainer accumulate_grad_batches analogue):
    # every optimizer update averages gradients over this many consecutive
    # loader batches (lax.scan over the microbatch stack inside ONE compiled
    # step; BatchNorm stats thread sequentially, exactly as if the batches
    # had been separate steps).  Trailing batches that don't fill a group
    # are dropped, like drop_remainder.
    accum_steps: int = 1
    # Stop training when an epoch's mean loss goes non-finite (diverged /
    # NaN-poisoned state): the best checkpoint so far is preserved and
    # history records the event, instead of burning the remaining epoch
    # budget training garbage.
    halt_on_nonfinite: bool = True
    # Periodic wall-clock autosave into the checkpointer's ``last`` slot at
    # step boundaries (0 = off).  Bounds the work lost to HARD failures —
    # OOM kill, host crash, kernel panic — which deliver no SIGTERM for the
    # PreemptionWatch to catch; a resume continues at the exact next step,
    # exactly like a preemption save.
    autosave_minutes: float = 0.0
    # Early stopping (Lightning ``EarlyStopping(monitor="val_wWAPE",
    # mode="min")`` analogue; the reference trains a fixed 50 epochs,
    # train_dl.py:203).  Stop after this many consecutive epochs without
    # the monitored val_wWAPE improving by more than ``early_stop_min_delta``
    # (0 = off).  The best checkpoint is already on disk when this fires —
    # the top-k retention keys on the same monitor.
    early_stop_patience: int = 0
    early_stop_min_delta: float = 0.0


class PreemptionWatch:
    """Graceful-shutdown watcher for preemptible accelerators.

    Cloud TPU/GPU VMs deliver SIGTERM with a short grace window before a
    preemption; the reference (single workstation GPU, no signal handling)
    simply dies and loses the run.  Entering the watch installs a SIGTERM
    handler that flips ``requested``; ``Trainer.fit`` consumes the flag at
    the next STEP boundary — save an emergency ``last`` checkpoint, record
    the event, return cleanly — so ``--resume_from`` continues the run on
    the replacement VM.  The previous handler is restored on exit.

    Installed only from the main thread (CPython restricts ``signal.signal``
    to it); elsewhere the watch is inert and training is simply not
    preemption-aware on that thread.  Multi-host note: a slice preemption
    delivers SIGTERM to every host, so the collective orbax save below
    proceeds on all processes; do not SIGTERM a single process of a
    multi-process run.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self.signals = signals
        self.requested = False
        self._previous = {}

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        if threading.current_thread() is threading.main_thread():
            for s in self.signals:
                self._previous[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            # ``prev`` is None when the displaced handler was installed
            # from C (signal.signal cannot restore those and raises
            # TypeError on None): fall back to the default disposition
            # rather than crashing fit() after a completed run.
            signal.signal(s, prev if prev is not None else signal.SIG_DFL)
        self._previous.clear()
        return False


class Trainer:
    """Compiled train/eval driver for any registry model."""

    def __init__(self, model, config: TrainConfig, mesh=None):
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        self._batch_sharding = batch_sharding(self.mesh)
        self._stacked_sharding = stacked_batch_sharding(self.mesh)
        self._replicated = replicated_sharding(self.mesh)
        self._train_step = None
        self._accum_step = None
        self._eval_step = None
        self.history = []

    # ------------------------------------------------------------------ init
    def init_state(self, example_batch) -> TrainState:
        rngs = {"params": jax.random.key(self.config.seed),
                "dropout": jax.random.key(self.config.seed + 1),
                "sampling": jax.random.key(self.config.seed + 2)}
        init_closure = lambda r, b: self.model.init(r, b, train=False)
        multiprocess = jax.process_count() > 1
        if multiprocess:
            # Each process holds only its local batch rows; assemble the
            # logical global batch before tracing (parallel/distributed.py).
            example_batch = global_batch(example_batch, self._batch_sharding)
        tp = self.mesh.shape.get("model", 1) > 1
        if tp or multiprocess:
            # Tensor parallel: wide kernels column-shard over ``model``
            # (parallel/sharding.py), everything else replicates.  Shardings
            # are computed on abstract shapes and applied as jit
            # out_shardings, so sharded params materialize directly in their
            # final placement (never fully on one device).
            abs_vars = jax.eval_shape(init_closure, rngs, example_batch)
            out_shardings = {
                k: (infer_param_sharding(v, self.mesh, self.config.tp_min_dim)
                    if k == "params"
                    else jax.tree_util.tree_map(lambda _: self._replicated, v))
                for k, v in abs_vars.items()}
            init_fn = jax.jit(init_closure, out_shardings=out_shardings)
        else:
            # jit the whole init: one compiled program instead of thousands
            # of eager dispatches (critical under tunneled TPU runtimes).
            init_fn = jax.jit(init_closure)
        variables = init_fn(rngs, example_batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", core.FrozenDict())
        tx = optim_lib.make_optimizer(params, self.config.grad_clip,
                                      self.config.learning_rate)
        if tp or multiprocess:
            # Optimizer state inherits shardings from the (committed) params
            # through XLA propagation; Adafactor's factored row/col stats end
            # up sharded wherever the reduced kernel dim stays sharded.
            opt_state = jax.jit(tx.init)(params)
            return TrainState(
                step=jax.device_put(jnp.zeros((), jnp.int32), self._replicated),
                params=params, batch_stats=batch_stats,
                opt_state=opt_state, tx=tx)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=tx.init(params),
                           tx=tx)
        # Replicate state over the mesh (params fit on one chip; data-parallel).
        return jax.device_put(state, self._replicated)

    # ------------------------------------------------------------- compiled
    def _train_loss(self, params, stats, batch, drop_rng, samp_rng):
        """Train-mode objective shared by the plain and accumulating steps
        (one source of truth — the two compiled paths cannot drift).
        Frozen-stage grads can never be emitted (XLA also DCEs them when
        unused — measured identical; see optim.py)."""
        variables = {"params": optim_lib.stop_frozen_gradients(params)}
        if stats:
            variables["batch_stats"] = stats
        out, mutated = self.model.apply(
            variables, batch, train=True,
            rngs={"dropout": drop_rng, "sampling": samp_rng},
            mutable=["batch_stats"])
        forecast, _aux = out
        target, pred = target_and_pred(batch, forecast)
        loss = mse_loss(target, pred, expand_mask(batch, target))
        return loss, mutated.get("batch_stats", stats)

    def _build_train_step(self):
        train_loss = self._train_loss

        def step_fn(state: TrainState, batch, rng):
            drop_rng, samp_rng = jax.random.split(jax.random.fold_in(rng, state.step))
            (loss, new_stats), grads = jax.value_and_grad(
                train_loss, has_aux=True)(state.params, state.batch_stats,
                                          batch, drop_rng, samp_rng)
            new_state = state.apply_gradients(grads, new_stats)
            return new_state, {"loss": loss}

        return jax.jit(step_fn, donate_argnums=0)

    def _build_accum_step(self):
        """One optimizer update from ``accum_steps`` microbatches.

        A ``lax.scan`` over the stacked microbatches computes gradients at
        the SAME params (standard accumulation), sums them, and threads
        BatchNorm stats sequentially — semantically the batches ran back to
        back, but params move once with the averaged gradient (the
        reference's ``pl.Trainer(accumulate_grad_batches=N)`` analogue)."""
        train_loss = self._train_loss

        def step_fn(state: TrainState, batches, rng):
            base_rng = jax.random.fold_in(rng, state.step)

            def micro(carry, xs):
                stats, gsum, lsum = carry
                batch_t, i = xs
                drop_rng, samp_rng = jax.random.split(
                    jax.random.fold_in(base_rng, i))
                (loss, stats), grads = jax.value_and_grad(
                    train_loss, has_aux=True)(state.params, stats, batch_t,
                                              drop_rng, samp_rng)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (stats, gsum, lsum + loss), None

            n = jax.tree_util.tree_leaves(batches)[0].shape[0]
            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (stats, gsum, lsum), _ = jax.lax.scan(
                micro, (state.batch_stats, zeros, 0.0),
                (batches, jnp.arange(n)))
            grads = jax.tree_util.tree_map(lambda g: g / n, gsum)
            new_state = state.apply_gradients(grads, stats)
            return new_state, {"loss": lsum / n}

        return jax.jit(step_fn, donate_argnums=0)

    def _build_eval_step(self):
        model = self.model
        cfg = self.config

        def step_fn(params, batch_stats, batch):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            (forecast, _aux) = model.apply(variables, batch, train=False)
            target, pred = target_and_pred(batch, forecast)
            row_mask = expand_mask(batch, target)
            return eval_metrics(target, pred, row_mask, norm_scalar=cfg.norm_scalar)

        return jax.jit(step_fn)

    # ------------------------------------------------------------------ api
    def train_step(self, state, batch, rng):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        batch = global_batch(batch, self._batch_sharding)
        return self._train_step(state, batch, rng)

    def accum_train_step(self, state, stacked, rng):
        """One update from a [accum_steps, batch, ...] microbatch stack."""
        if self._accum_step is None:
            self._accum_step = self._build_accum_step()
        stacked = global_batch(stacked, self._stacked_sharding)
        return self._accum_step(state, stacked, rng)

    def _train_inputs(self, loader, skip_groups: int = 0):
        """Loader batches, grouped+stacked when accumulating gradients.

        ``skip_groups`` drops the first N optimizer-step groups (mid-epoch
        resume): when the loader supports index-level skipping
        (``BatchLoader.iter_from``) the skipped batches are never assembled
        — no image gather, no host copies — otherwise they are assembled
        and discarded (foreign loaders), which is correct but slow."""
        A = max(1, self.config.accum_steps)
        skip_batches = skip_groups * A
        if skip_batches and hasattr(loader, "iter_from"):
            it = loader.iter_from(skip_batches)
        else:
            it = iter(loader)
            for _ in range(skip_batches):
                next(it, None)
        if A <= 1:
            yield from it
            return
        group = []
        for b in it:
            group.append(b)
            if len(group) == A:
                yield {k: np.stack([g[k] for g in group]) for k in group[0]}
                group = []
        # A trailing partial group is dropped (see TrainConfig.accum_steps).

    def _dispatch_step(self, state, item, rng):
        if self.config.accum_steps > 1:
            return self.accum_train_step(state, item, rng)
        return self.train_step(state, item, rng)

    def eval_step(self, state, batch):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        batch = global_batch(batch, self._batch_sharding)
        return self._eval_step(state.params, state.batch_stats, batch)

    def evaluate(self, state, loader: BatchLoader) -> Dict[str, float]:
        sums = None
        for batch in loader:
            part = self.eval_step(state, batch)
            sums = part if sums is None else jax.tree_util.tree_map(
                jnp.add, sums, part)
        if sums is None:
            raise ValueError(
                "evaluate() got a loader with zero batches — the validation "
                "split is empty (or smaller than batch_size with "
                "drop_remainder)")
        sums = {k: float(v) for k, v in sums.items()}
        out = finalize_metrics(sums)
        return {"val_mae": out["mae"], "val_wWAPE": out["wape"]}

    def fit(self, train_loader: BatchLoader, val_loader: BatchLoader,
            state: Optional[TrainState] = None, checkpointer=None,
            log_fn: Callable[[Dict], None] = None,
            start_epoch: int = 0, skip_steps: int = 0) -> TrainState:
        """``start_epoch`` carries a resumed run's position so it trains only
        the remaining epochs (a resume that restarts at 0 double-trains);
        ``skip_steps`` skips the first N optimizer steps of ``start_epoch``
        (they are already inside a mid-epoch preemption/autosave state —
        ``restore_latest`` returns both).  With the loader's epoch order
        pinned by ``set_epoch`` and the per-step rng stream folded on the
        restored global ``state.step``, a preempted-and-resumed run
        reproduces the uninterrupted one exactly."""
        A = self.config.accum_steps
        if A > 1 and A > len(train_loader):
            raise ValueError(
                f"accum_steps={A} exceeds the {len(train_loader)} train "
                f"batches per epoch — every epoch would drop its only "
                f"(partial) group and train on nothing")
        if state is None:
            state = self.init_state(next(iter(train_loader)))
        rng = jax.random.key(self.config.seed + 1000)
        t0 = time.time()
        want_trace = self.config.trace_dir is not None
        steps_per_epoch = len(train_loader) // max(1, self.config.accum_steps)
        watch = PreemptionWatch()
        with watch:
            return self._fit_epochs(train_loader, val_loader, state, rng, t0,
                                    want_trace, steps_per_epoch, start_epoch,
                                    skip_steps, checkpointer, log_fn, watch)

    def _fit_epochs(self, train_loader, val_loader, state, rng, t0,
                    want_trace, steps_per_epoch, start_epoch, skip_steps,
                    checkpointer, log_fn, watch):
        can_save_last = checkpointer is not None and hasattr(
            checkpointer, "save_preempted")
        autosave_s = self.config.autosave_minutes * 60.0
        next_autosave = time.time() + autosave_s
        best_monitor, stale_epochs = np.inf, 0
        if self.config.early_stop_patience and start_epoch > 0 and \
                hasattr(checkpointer, "best_metric"):
            # Resume: rebuild the early-stopping bookkeeping from the saved
            # best epoch so the resumed run stops where the uninterrupted
            # one would have (exact for min_delta=0 — the CLI surface; with
            # min_delta>0 a sub-threshold improvement before the best epoch
            # is counted as the best, a conservative approximation).
            bm = checkpointer.best_metric()
            if bm is not None:
                best_epoch, best_monitor = bm
                stale_epochs = max(0, start_epoch - 1 - best_epoch)
        for epoch in range(start_epoch, self.config.epochs):
            if hasattr(train_loader, "set_epoch"):
                # Pin the shuffle to (seed, epoch) so a resumed process
                # replays the SAME epoch orders the uninterrupted run would
                # have used (torch DistributedSampler.set_epoch analogue).
                train_loader.set_epoch(epoch)
            skip = skip_steps if epoch == start_epoch else 0
            losses = []
            for batch in self._train_inputs(train_loader, skip_groups=skip):
                if watch.requested:
                    break  # handled at the loop exit below
                if want_trace and epoch == start_epoch and (
                        len(losses) == 1 or steps_per_epoch == 1):
                    # Second step of the run: compiled, steady-state (first
                    # step, compile included, when the epoch has one step).
                    from visuelle2_tpu.utils.tracing import trace

                    with trace(self.config.trace_dir):
                        state, m = self._dispatch_step(state, batch, rng)
                        jax.block_until_ready(m["loss"])
                    want_trace = False
                else:
                    state, m = self._dispatch_step(state, batch, rng)
                losses.append(m["loss"])
                done = skip + len(losses)
                if autosave_s and can_save_last and not watch.requested \
                        and time.time() >= next_autosave:
                    checkpointer.save_preempted(epoch, state,
                                                steps_into_epoch=done)
                    next_autosave = time.time() + autosave_s
                if watch.requested:
                    break
            if watch.requested:
                # Graceful shutdown (SIGTERM / preemption notice): save the
                # mid-epoch state into the ``last`` slot and stop at this
                # step boundary — never running validation inside the grace
                # window.  --resume_from continues at the NEXT step of this
                # epoch (fit_skip; == steps_per_epoch when the notice landed
                # on the final step, in which case the resume skips straight
                # to the epoch-end validation/checkpoint).
                done = skip + len(losses)
                if can_save_last:
                    checkpointer.save_preempted(epoch, state,
                                                steps_into_epoch=done)
                metrics = {"epoch": epoch, "preempted": True,
                           "steps_into_epoch": done,
                           "wall_s": time.time() - t0}
                self.history.append(metrics)
                if log_fn:
                    log_fn(metrics)
                return state
            # A resume that skipped the whole epoch (preempted at its final
            # step boundary) has no fresh losses: the epoch-end validation
            # and checkpoint still run, just with no train_loss entry (a
            # NaN would poison strict-JSON readers of metrics.jsonl).
            if losses:
                train_loss = float(jnp.mean(jnp.stack(losses)))
                if self.config.halt_on_nonfinite \
                        and not np.isfinite(train_loss):
                    metrics = {"epoch": epoch, "train_loss": train_loss,
                               "halted": "non-finite train loss",
                               "wall_s": time.time() - t0}
                    self.history.append(metrics)
                    if log_fn:
                        log_fn(metrics)
                    return state
            metrics = self.evaluate(state, val_loader)
            metrics.update(epoch=epoch, wall_s=time.time() - t0,
                           # Reference parity: the per-epoch Adafactor LR
                           # (CrossAttnRNN210.py:278-286) in console + JSONL.
                           lr=optim_lib.current_lr(int(state.step),
                                                   self.config.learning_rate))
            if losses:
                metrics["train_loss"] = train_loss
            patience = self.config.early_stop_patience
            if patience:
                if metrics["val_wWAPE"] < best_monitor - \
                        self.config.early_stop_min_delta:
                    best_monitor, stale_epochs = metrics["val_wWAPE"], 0
                else:
                    stale_epochs += 1
                    if stale_epochs >= patience:
                        metrics["early_stopped"] = stale_epochs
            self.history.append(metrics)
            if log_fn:
                log_fn(metrics)
            if checkpointer is not None:
                checkpointer.save(epoch, state, metrics)
            if metrics.get("early_stopped"):
                return state
        return state
