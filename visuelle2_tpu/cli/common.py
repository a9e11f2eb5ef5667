"""Shared CLI plumbing: dataset/loader construction, seeding, logging.

Preserves the reference's flag surface (SURVEY.md §5) while replacing the
stdout-grep checkpoint handoff of ``run_all.sh`` with returned paths.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Tuple

import numpy as np

from visuelle2_tpu.data.images import ImageStore
from visuelle2_tpu.data.loader import BatchLoader
from visuelle2_tpu.data.pipeline import (
    load_label_dicts,
    load_norm_scalar,
    load_visuelle2,
)
from visuelle2_tpu.models.base import VocabSizes


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset_path", type=str, default="../visuelle2/")
    p.add_argument("--seed", type=int, default=21)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--quick_debug", action="store_true")
    p.add_argument("--image_arch", type=str, default="resnet101",
                   choices=["resnet50", "resnet101", "tiny"])
    p.add_argument("--image_size", type=int, default=299)
    p.add_argument("--bf16_backbone", action="store_true",
                   help="run the image backbone in bfloat16 (TPU MXU)")
    p.add_argument("--pretrained_backbone", type=str, default="",
                   help=".npz from scripts/convert_pretrained.py; spliced "
                        "into every image encoder's backbone after init "
                        "(the reference finetunes torchvision-pretrained "
                        "CNNs, CrossAttnRNN21.py:61)")
    p.add_argument("--gpu_num", type=int, default=0,
                   help="accepted for reference CLI compatibility "
                        "(train_dl.py:204); device selection is JAX's")
    p.add_argument("--trace_dir", type=str, default="",
                   help="capture a jax.profiler device trace of one "
                        "steady-state train step into this directory "
                        "(TensorBoard/Perfetto)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone blocks on backward "
                        "(jax.checkpoint): FLOPs for HBM, fits larger "
                        "train batches")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="average gradients over N consecutive batches per "
                        "optimizer update (pl.Trainer accumulate_grad_"
                        "batches analogue; effective batch = N x batch_size)")
    # wandb-compatible flags (kept for CLI parity; logging is JSONL locally)
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--wandb_entity", type=str, default="")
    p.add_argument("--wandb_project", type=str, default="")
    p.add_argument("--wandb_run", type=str, default="")
    return p


def build_loaders(args, *, demand: bool, output_len: int,
                  splits=("train", "test"),
                  text_features: bool = False,
                  dedup_eval_images: bool = False,
                  dedup_train_images: bool = False,
                  dedup_image_slots: int = 0) -> Tuple[dict, VocabSizes, float]:
    """Returns ({split: BatchLoader}, vocab, norm_scalar).

    ``text_features=True`` runs the gtm_v1 ingest-time text featurizer
    (frozen BERT, or the deterministic crc32 fallback under zero egress) over
    each split and attaches the [N, 768] array as a batch extra.
    ``dedup_eval_images`` makes non-train loaders ship unique-image batches
    (loader.py dedup_images) — identical outputs, backbone FLOPs divided by
    the product-photo duplication factor.  ``dedup_train_images`` does the
    same for the train loader via the grouped-shuffle sampler (per-row loss
    and gradients unchanged up to BatchNorm statistics weighting each unique
    photo once and rows sharing a photo seeing one shared dropout mask on
    their image features — see loader.py).  ``dedup_image_slots`` forces the
    exact slot count (e.g. serving an exported artifact whose signature
    fixed it at export time) instead of deriving it from the local device
    count."""
    cat_dict, col_dict, fab_dict = load_label_dicts(args.dataset_path)
    vocab = VocabSizes.from_dicts(cat_dict, col_dict, fab_dict)
    norm_scalar = load_norm_scalar(args.dataset_path)

    featurizer = None
    if text_features:
        from visuelle2_tpu.models.gtm_v1 import TextFeaturizer

        featurizer = TextFeaturizer(cat_dict, col_dict, fab_dict)

    loaders = {}
    for split in splits:
        arrays = load_visuelle2(args.dataset_path, split, demand=demand,
                                output_len=output_len)
        if args.quick_debug:
            arrays = arrays.subset(1000)  # train_dl.py:80-82
        store = ImageStore.build(
            os.path.join(args.dataset_path, "images"), arrays.image_paths,
            cache_file=ImageStore.cache_path(args.dataset_path, split,
                                             args.image_size),
            size=args.image_size)
        extras = None
        if featurizer is not None:
            extras = {"text_features": featurizer(
                arrays.cat, arrays.col, arrays.fab).astype(np.float32)}
        dedup = dedup_train_images if split == "train" else dedup_eval_images
        if dedup:
            import jax

            slots_multiple = jax.device_count()
        loaders[split] = BatchLoader(
            arrays, store, args.batch_size,
            shuffle=(split == "train"), seed=args.seed,
            drop_remainder=(split == "train"), extras=extras,
            dedup_images=dedup,
            image_slots_multiple=slots_multiple if dedup else 1,
            image_slots=dedup_image_slots if dedup else 0)
        if featurizer is not None:
            # Which featurizer produced this split's text_features (BERT vs
            # the crc32 fallback) — recorded into hparams.json at train time
            # and checked at forecast time (train/hparams.py).
            loaders[split].text_fingerprint = featurizer.fingerprint
    return loaders, vocab, norm_scalar


def resolve_quantize(args, loader) -> str:
    """Concrete ``--quantize`` mode for a forecast run ("", "int8", "w8a8").

    ``auto`` applies the measured w8a8-vs-dedup policy
    (models/quantized_resnet.py::resolve_auto_mode, thresholds from
    docs/perf_dedup_series.json): the int8 engine wins on byte-bound
    early-stage activation traffic, which image dedup shrinks — so auto
    picks w8a8 at the static duplication factors where it measured faster
    and the float path above them.  Any other value passes through.
    """
    mode = getattr(args, "quantize", "") or ""
    if mode != "auto":
        return mode
    from visuelle2_tpu.models import quantized_resnet as qr
    from visuelle2_tpu.models.resnet import STAGE_BLOCKS

    # True (pre-padding) unique-image count: image_slots is rounded up to a
    # device-count multiple or forced by an artifact signature, which would
    # understate duplication near the d<=4 crossover.
    slots = (getattr(loader, "unique_image_slots", 0)
             or getattr(loader, "image_slots", 0))
    duplication = loader.batch_size / slots if slots else 1.0
    # Any production ResNet variant the engine supports (the interceptor keys
    # off ResNetBackbone, not the arch string); 'tiny' is test-only and too
    # small for the measured byte-bound win region.
    has_resnet = bool(getattr(args, "use_img", 1)) and getattr(
        args, "image_arch", "") in (set(STAGE_BLOCKS) - {"tiny"})
    mode = qr.resolve_auto_mode(duplication=duplication,
                                has_resnet_backbone=has_resnet)
    why = (f"duplication={duplication:.1f} (batch {loader.batch_size} / "
           f"{slots} unique images)" if slots else "no image dedup")
    print(f"[quantize auto] {why}, resnet={int(has_resnet)} -> "
          f"{mode or 'float path'} (win region: d <= "
          f"{qr.W8A8_AUTO_MAX_DUPLICATION:g}, docs/perf_dedup_series.json)")
    return mode


def add_quantize_calib_args(p):
    """w8a8 calibration knobs shared by the forecast CLIs."""
    p.add_argument("--calib_batches", type=int, default=2,
                   help="batches used to calibrate w8a8 activation scales")
    p.add_argument("--calib_split", type=str, default="test",
                   choices=["test", "train"],
                   help="split the calibration batches come from.  The "
                        "default (test) matches exported-artifact semantics "
                        "but reuses the metric split's statistics; pass "
                        "train for leakage-free calibration")


def build_w8a8_serving_path(model, variables, loaders, args):
    """Shared w8a8 prologue (forecast_dl / forecast_transformer): calibrate
    activation scales on ``--calib_batches`` batches of ``--calib_split`` and
    return the quantized ``apply_fn`` (models/quantized_resnet.py)."""
    from visuelle2_tpu.models import quantized_resnet as qr

    split = getattr(args, "calib_split", "test") or "test"
    if split not in loaders:
        print(f"[w8a8] calib split '{split}' not loaded; using test")
        split = "test"
    n = max(1, int(getattr(args, "calib_batches", 2)))
    calib_batches = [b for b, _ in zip(iter(loaders[split]), range(n))]
    apply_fn, calib = qr.build_serving_path(model, variables, calib_batches)
    print(f"[w8a8] int8 backbone: {len(calib)} activation scales "
          f"calibrated on {len(calib_batches)} {split} batches")
    return apply_fn


def apply_pretrained_backbone(state, args):
    """Splice a converted pretrained backbone (.npz) into a fresh TrainState
    when ``--pretrained_backbone`` is set; no-op otherwise."""
    path = getattr(args, "pretrained_backbone", "")
    if not path:
        return state
    from visuelle2_tpu.models.pretrained import load_backbone_npz, splice_backbone

    bb = load_backbone_npz(path)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    spliced = splice_backbone(variables, bb)
    import jax.numpy as jnp
    from jax import tree_util

    # Keep the model's param dtypes (e.g. a bf16 backbone) on the new leaves.
    cast = tree_util.tree_map(lambda old, new: jnp.asarray(new, old.dtype),
                              state.params, spliced["params"])
    new_stats = state.batch_stats
    if state.batch_stats:
        new_stats = type(state.batch_stats)(tree_util.tree_map(
            lambda old, new: jnp.asarray(new, old.dtype),
            dict(state.batch_stats), spliced["batch_stats"]))
    print(f"loaded pretrained backbone from {path}")
    return state.replace(params=cast, batch_stats=new_stats)


def prepare_initial_state(trainer, loaders, args):
    """Shared train-CLI prologue: pretrained-backbone splice and/or
    resume-from-latest-epoch.  Returns ``(state_or_None, start_epoch,
    skip_steps)`` — ``skip_steps`` > 0 means the restored state already
    contains that many optimizer steps of ``start_epoch`` (mid-epoch
    preemption/autosave save) and ``fit`` must skip them."""
    state = None
    start_epoch = 0
    skip_steps = 0
    if getattr(args, "pretrained_backbone", ""):
        state = trainer.init_state(next(iter(loaders["train"])))
        state = apply_pretrained_backbone(state, args)
    if getattr(args, "resume_from", ""):
        from visuelle2_tpu.train.checkpoint import CheckpointManager

        # ``--resume_from auto`` makes the SAME train command idempotent
        # across preemptions/restarts: resume from --ckpt_dir when it holds
        # a checkpoint, start fresh when it doesn't (no error).
        auto = args.resume_from == "auto"
        resume_dir = args.ckpt_dir if auto else args.resume_from
        if state is None:
            state = trainer.init_state(next(iter(loaders["train"])))
        try:
            src = CheckpointManager(resume_dir, read_only=True)
        except FileNotFoundError as e:
            if not auto:
                raise SystemExit(f"--resume_from: {e}")
            print(f"--resume_from auto: {resume_dir} empty, starting fresh")
            return state, start_epoch, skip_steps
        try:
            # Prefers the ``last`` slot: the true latest state (top-k
            # retention may have deleted every epoch after the best one),
            # including a preemption save whose fit_epoch/fit_skip continue
            # the interrupted epoch at the exact next step
            # (train/checkpoint.py).
            state, start_epoch, skip_steps = src.restore_latest(state)
        except FileNotFoundError as e:
            if not auto:
                raise SystemExit(f"--resume_from: {e}")
            print(f"--resume_from auto: {resume_dir} empty, starting fresh")
            return state, start_epoch, skip_steps
        finally:
            src.close()
        skipping = f" skipping {skip_steps} done steps" if skip_steps else ""
        print(f"resumed from {resume_dir} -> epoch {start_epoch} "
              f"(step {int(state.step)}){skipping}")
    return state, start_epoch, skip_steps


class JsonlLogger:
    """Local metrics log; optionally mirrors to wandb when requested and the
    package is importable (flag-compatible with the reference's
    ``--use_wandb`` surface, ``train_dl.py:159-162``; SURVEY.md §2.5)."""

    def __init__(self, path: Optional[str], wandb_args=None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None
        self._wandb = None
        if wandb_args is not None and getattr(wandb_args, "use_wandb", False):
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_args.wandb_project or None,
                    entity=wandb_args.wandb_entity or None,
                    name=wandb_args.wandb_run or None)
            except Exception as e:
                print(f"[logger] wandb unavailable ({type(e).__name__}); "
                      "metrics go to stdout/JSONL only")

    def __call__(self, metrics: dict):
        line = {k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
                for k, v in metrics.items()}
        print("  ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                        for k, v in line.items()))
        if self._f:
            self._f.write(json.dumps(line) + "\n")
            self._f.flush()
        if self._wandb is not None:
            self._wandb.log(line)
