"""Pipeline runner: train -> forecast for all three CrossAttnRNN tasks.

Replaces ``/root/reference/run_all.sh`` (which greps stdout for the best
checkpoint path, ``run_all.sh:6,19,32``) with in-process handoff of the
returned checkpoint directory.
"""

from __future__ import annotations

import argparse

from visuelle2_tpu.cli import forecast_dl, forecast_stat, train_dl


def _base(args):
    out = ["--dataset_path", args.dataset_path,
           "--batch_size", str(args.batch_size),
           "--image_arch", args.image_arch,
           "--image_size", str(args.image_size)]
    if args.quick_debug:
        out.append("--quick_debug")
    return out


def _train_extras(args):
    out = []
    if getattr(args, "dedup_images", 0):
        out += ["--dedup_images", "1"]
    if getattr(args, "accum_steps", 1) > 1:
        out += ["--accum_steps", str(args.accum_steps)]
    if getattr(args, "remat", False):
        out.append("--remat")
    return out


def run(args):
    results = {}
    base = _base(args)
    train_base = base + ["--epochs", str(args.epochs)] + _train_extras(args)

    # Task 1: SO-fore 2-1 (run_all.sh:3-12)
    t = train_dl.build_parser().parse_args(train_base + [
        "--task_mode", "0", "--output_len", "1",
        "--ckpt_dir", f"{args.ckpt_root}/ckpt_21"])
    best = train_dl.run(t)
    f = forecast_dl.build_parser().parse_args(base + [
        "--task_mode", "0", "--ckpt_path", best or ""])
    results["so_fore_2_1"] = forecast_dl.run(f)

    # Task 2: SO-fore 2-10 (run_all.sh:16-25)
    t = train_dl.build_parser().parse_args(train_base + [
        "--task_mode", "1", "--output_len", "10", "--use_teacher_forcing",
        "--ckpt_dir", f"{args.ckpt_root}/ckpt_210"])
    best = train_dl.run(t)
    f = forecast_dl.build_parser().parse_args(base + [
        "--task_mode", "1", "--ckpt_path", best or ""])
    results["so_fore_2_10"] = forecast_dl.run(f)

    # Task 3: Demand (run_all.sh:29-38)
    t = train_dl.build_parser().parse_args(train_base + [
        "--demand", "1", "--ckpt_dir", f"{args.ckpt_root}/ckpt_demand"])
    best = train_dl.run(t)
    f = forecast_dl.build_parser().parse_args(base + [
        "--new_product", "1", "--ckpt_path", best or ""])
    results["demand"] = forecast_dl.run(f)

    # Statistical baselines for context (forecast_stat.py)
    for method in ("naive", "ses", "holt"):
        s = forecast_stat.build_parser().parse_args(base + [
            "--method", method])
        results[f"stat_{method}"] = forecast_stat.run(s)

    print(results)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_path", type=str, default="../visuelle2/")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--ckpt_root", type=str, default="ckpts")
    p.add_argument("--image_arch", type=str, default="resnet101")
    p.add_argument("--image_size", type=int, default=299)
    p.add_argument("--quick_debug", action="store_true")
    p.add_argument("--dedup_images", type=int, default=0,
                   help="unique-image training batches (grouped sampler)")
    p.add_argument("--accum_steps", type=int, default=1)
    p.add_argument("--remat", action="store_true")
    run(p.parse_args())


if __name__ == "__main__":
    main()
