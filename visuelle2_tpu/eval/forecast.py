"""One-pass sharded test-split scoring.

The reference evaluates with a host-side ``torch.no_grad()`` batch loop,
collecting every forecast on CPU before computing WAPE/MAE
(``/root/reference/forecast_dl.py:128-198``).  TPU-native redesign
(SURVEY.md §7.8): the split is padded to a static shape, sharded over the
mesh's ``data`` axis, and scored by compiled steps that keep only partial
metric sums on device; the final WAPE/MAE reduction is exact.  Also reports
forecasts/sec/chip (the north-star throughput metric) and GFLOPs/sample from
XLA cost analysis (thop replacement, ``forecast_dl.py:148-160``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from visuelle2_tpu.data.loader import BatchLoader
from visuelle2_tpu.eval.profiler import compiled_stats
from visuelle2_tpu.ops.metrics import eval_metrics, finalize_metrics
from visuelle2_tpu.parallel.mesh import batch_sharding, make_mesh
from visuelle2_tpu.train.loop import expand_mask, target_and_pred


def dump_attention(model, variables, batch, path: str):
    """Save the model's aux attention weights for one batch as an ``.npz``.

    The reference models return ``(forecast, attn_weights)`` and the Demand
    model collects per-step img/trend/multimodal alphas
    (``/root/reference/models/CrossAttnRNNDemand.py:280,293,321``) that its
    forecast script then discards; here they are exposed for analysis.
    Returns the list of saved keys, or None when the model has no attention
    aux (e.g. the stock-transformer-decoder GTM family).
    """
    _, aux = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    if aux is None:
        return None

    def _name(p):
        return "/".join(str(getattr(e, "key", getattr(e, "idx", e)))
                        for e in p)

    arrays = {_name(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(aux)}
    np.savez(path, **arrays)
    return sorted(arrays)


def _probe_rt(noop, d0):
    t0 = time.perf_counter()
    np.asarray(noop(d0))
    return time.perf_counter() - t0


@dataclasses.dataclass
class ForecastResult:
    wape: float
    mae: float
    num_forecasts: int  # masked forecast ROWS (not rows x horizon values)
    forecasts_per_sec: Optional[float] = None
    forecasts_per_sec_per_chip: Optional[float] = None
    gflops_per_sample: Optional[float] = None
    peak_hbm_bytes: Optional[int] = None  # of one compiled eval batch

    def summary(self) -> str:
        parts = [f"WAPE: {self.wape:.3f}", f"MAE: {self.mae:.3f}"]
        if self.forecasts_per_sec_per_chip:
            parts.append(f"{self.forecasts_per_sec_per_chip:,.0f} forecasts/s/chip")
        if self.gflops_per_sample:
            parts.append(f"{self.gflops_per_sample:.3f} GFLOPs/sample")
        if self.peak_hbm_bytes:
            parts.append(f"peak HBM {self.peak_hbm_bytes / 2**30:.2f} GiB/batch")
        return ", ".join(parts)


# One-pass eval keeps the WHOLE split resident in HBM next to the params.
# v5e-class chips have 16 GiB; leaving headroom for weights, activations and
# XLA workspace, splits whose stacked input bytes exceed this budget fall
# back to the per-batch compiled loop (identical metrics, lower peak memory).
ONE_PASS_HBM_BUDGET_BYTES = 4 << 30


def score_split(model, variables, loader: BatchLoader, *, mesh=None,
                norm_scalar: float = 53.0, measure_throughput: bool = True,
                timing_iters: int = 10,
                one_pass: Optional[bool] = None,
                apply_fn=None) -> ForecastResult:
    """Score a test split.

    ``apply_fn`` overrides ``model.apply`` for alternate execution paths
    over the same variables (e.g. the w8a8 int8 backbone,
    models/quantized_resnet.py) — metrics, FLOPs, and throughput then all
    reflect that path.

    ``one_pass=True`` stacks every batch and scores the ENTIRE split in a
    single jitted ``lax.scan`` dispatch — the split stays resident in HBM,
    sharded over the mesh's ``data`` axis, with zero per-batch host round
    trips (the north-star single-pass mode, and the DEFAULT).
    ``one_pass=None`` (auto) picks one-pass unless the split's stacked
    input bytes exceed ``ONE_PASS_HBM_BUDGET_BYTES``; ``False`` forces the
    per-batch compiled loop (lower peak memory, same metrics).
    """
    mesh = mesh if mesh is not None else make_mesh(model=1)
    sharding = batch_sharding(mesh)
    n_chips = mesh.devices.size

    if one_pass is None:
        if len(loader) == 0:
            one_pass = False
        else:
            est = (sum(np.asarray(v).nbytes
                       for v in next(iter(loader)).values()) * len(loader))
            one_pass = est <= ONE_PASS_HBM_BUDGET_BYTES

    apply_fn = apply_fn if apply_fn is not None else model.apply

    @jax.jit
    def eval_step(variables, batch):
        forecast, _ = apply_fn(variables, batch, train=False)
        target, pred = target_and_pred(batch, forecast)
        row_mask = expand_mask(batch, target)
        return eval_metrics(target, pred, row_mask, norm_scalar=norm_scalar)

    if one_pass:
        host_batches = list(loader)
        if not host_batches:
            raise ValueError("score_split got a loader with zero batches — "
                             "the split is empty")
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *host_batches)
        # Shard the within-batch axis (axis 1) over data; scan over axis 0.
        from jax.sharding import NamedSharding, PartitionSpec as P

        stacked = jax.device_put(
            stacked, NamedSharding(mesh, P(None, "data")))

        @jax.jit
        def scan_all(variables, stacked):
            def body(carry, batch):
                part = eval_step(variables, batch)
                return jax.tree_util.tree_map(jnp.add, carry, part), ()

            init = {"abs_err": jnp.zeros(()), "abs_gt": jnp.zeros(()),
                    "count": jnp.zeros(()), "rows": jnp.zeros(())}
            sums, _ = jax.lax.scan(body, init, stacked)
            return sums

        sums = scan_all(variables, stacked)
        # Keep one device batch around for the FLOPs/throughput probes below.
        batches = ([jax.device_put(host_batches[0], sharding)]
                   if host_batches else [])
    else:
        sums = None
        batches = []
        for batch in loader:
            batch = jax.device_put(batch, sharding)
            if len(batches) < timing_iters:
                # Keep only what the FLOPs/throughput probes below need:
                # retaining every device batch would grow peak HBM to the
                # whole split — exactly what this fallback path exists to
                # avoid (ONE_PASS_HBM_BUDGET_BYTES).
                batches.append(batch)
            part = eval_step(variables, batch)
            sums = part if sums is None else jax.tree_util.tree_map(
                jnp.add, sums, part)
        if sums is None:
            raise ValueError("score_split got a loader with zero batches — "
                             "the split is empty")
    sums = {k: float(v) for k, v in sums.items()}
    fin = finalize_metrics(sums)

    fps = fps_chip = gflops = peak_hbm = None
    if batches:
        b0 = batches[0]
        bs = int(b0["mask"].shape[0])
        total, mem = compiled_stats(eval_step, variables, b0)
        if total is not None and np.isfinite(total):
            gflops = total / bs / 1e9
        if mem is not None:
            peak_hbm = mem["peak_bytes"]
        if measure_throughput:
            # Relay-safe methodology (CLAUDE.md "Benchmark integrity", same
            # as bench.py): identical dispatches are deduped, independent
            # dispatches overlap, block_until_ready can return early, and
            # the dispatch+fetch round trip costs ~28 ms — so the
            # measurement is ONE jitted lax.scan over DISTINCT per-step
            # batches whose carry serializes the steps, with the host fetch
            # (np.asarray) as the completion barrier and the separately
            # measured round-trip floor subtracted.
            from jax.sharding import NamedSharding, PartitionSpec as P

            noop = jax.jit(lambda x: x + 1.0)
            d0 = jax.device_put(np.float32(0.0))
            np.asarray(noop(d0))
            rt = min(_probe_rt(noop, d0) for _ in range(5))

            def _stack(offset):
                # Roll on HOST numpy, not eager jnp: an eager roll of a
                # committed sharded array compiles a fresh multi-device
                # program per call outside jit, a path that flakily
                # SIGABRTs in XLA:CPU under the virtual 8-device mesh
                # (observed ~40% in the test suite).  The probe only needs
                # DISTINCT step inputs; where they live while being built
                # is irrelevant.
                sel = [jax.tree_util.tree_map(
                    lambda x, i=i: np.roll(np.asarray(x), offset + i, axis=0),
                    batches[(offset + i) % len(batches)])
                    for i in range(timing_iters)]
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *sel)
                return jax.device_put(
                    stacked, NamedSharding(mesh, P(None, "data")))

            @jax.jit
            def scan_eval(variables, stacked):
                def body(carry, b):
                    forecast, _ = apply_fn(variables, b, train=False)
                    return carry + jnp.sum(forecast), ()

                tot, _ = jax.lax.scan(body, jnp.zeros(()), stacked)
                return tot

            warm, timed = _stack(0), _stack(1)
            np.asarray(scan_eval(variables, warm))  # compile + warmup
            t0 = time.perf_counter()
            np.asarray(scan_eval(variables, timed))
            dt = (time.perf_counter() - t0 - rt) / timing_iters
            dt = max(dt, 1e-9)
            fps = bs / dt
            fps_chip = fps / n_chips

    return ForecastResult(
        wape=fin["wape"], mae=fin["mae"], num_forecasts=int(sums["rows"]),
        forecasts_per_sec=fps, forecasts_per_sec_per_chip=fps_chip,
        gflops_per_sample=gflops, peak_hbm_bytes=peak_hbm)
