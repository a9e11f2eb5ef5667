"""Real-dataset parity protocol: fill BASELINE.md's table in one command.

This container has no VISUELLE2 dataset, so the north-star WAPE/MAE
comparison (``/root/reference/forecast_dl.py:191-198``) cannot be produced
here.  On a machine WITH the dataset, this script runs the full reference
protocol through our CLIs — statistical baselines, the three CrossAttnRNN
tasks, and the transformer family — and emits the BASELINE.md table rows as
markdown + JSON, each annotated with the exact reference command that
produces the comparison number on the torch side.

    python scripts/run_parity_protocol.py --dataset_path /data/visuelle2 \
        --out_prefix parity_r3          # full protocol: 50 epochs, bs 128

    python scripts/run_parity_protocol.py --dataset_path /tmp/vis2 --quick \
        --out_prefix /tmp/parity_dry    # dry-run: tiny dims, 1 epoch

``--quick`` is the synthetic-stand-in dry run used to validate the protocol
end to end in this container (see docs/RESULTS_r3.md); drop it for the real
measurement.  Reference training configs are pinned to
``/root/reference/train_dl.py:187-216`` (seed 21, bs 128, 50 epochs,
dims 512) and ``train_GTM_visuelle2.py:160-175`` (emb 32, hidden 64).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRANSFORMER_MODELS = ["gtm", "m4ft", "gated_v1", "gated_v2", "gated_v3",
                      "gated_v4"]

REF = {
    "stat": "python forecast_stat.py --dataset_path D --method {m} "
            "--use_teacher_forcing {tf}",
    "task0": "python train_dl.py --dataset_path D --task_mode 0 && "
             "python forecast_dl.py --dataset_path D --task_mode 0 "
             "--ckpt_path <best>",
    "task1": "python train_dl.py --dataset_path D --task_mode 1 && "
             "python forecast_dl.py --dataset_path D --task_mode 1 "
             "--ckpt_path <best>",
    "demand": "python train_dl.py --dataset_path D --new_product 1 && "
              "python forecast_dl.py --dataset_path D --new_product 1 "
              "--ckpt_path <best>",
    "transformer": "python train_{M}_visuelle2.py --dataset_path D && "
                   "python forecast_{M}.py --dataset_path D "
                   "--ckpt_path <best>",
}


def _common(args, extra):
    out = ["--dataset_path", args.dataset_path,
           "--batch_size", str(args.batch_size),
           "--image_size", str(args.image_size)]
    if args.quick:
        out += ["--image_arch", "tiny"]
    elif args.pretrained_backbone:
        out += ["--pretrained_backbone", args.pretrained_backbone]
    return out + extra


def _w8a8_row(label, q, float_r):
    """int8 serving-engine accuracy sign-off (VERDICT r4 #4): quantized
    WAPE/MAE on the SAME trained checkpoint, plus deltas vs its own bf16
    eval.  No reference counterpart — the comparison target is our float
    run (the reference has no quantized path)."""
    return {"row": f"{label} WAPE/MAE", "wape": q.wape, "mae": q.mae,
            "wape_delta_vs_float": round(q.wape - float_r.wape, 4),
            "mae_delta_vs_float": round(q.mae - float_r.mae, 4),
            "hw": "TPU",
            "reference_cmd": "(none — int8 engine sign-off vs our float run)"}


def run_stats(args, rows):
    from visuelle2_tpu.cli import forecast_stat

    # Both teacher-forcing modes, like the reference README: TF=1 is the
    # SO-fore2-1 protocol, TF=0 the SO-fore2-10 one (repeat-first windows).
    for tf, task in ((1, "SO-fore2-1"), (0, "SO-fore2-10")):
        for m in ("naive", "ses", "holt"):
            a = forecast_stat.build_parser().parse_args(_common(args, [
                "--method", m, "--use_teacher_forcing", str(tf),
                "--output_len", "1"]))
            wape, mae = forecast_stat.run(a)
            rows.append({"row": f"{task} {m} WAPE/MAE",
                         "wape": wape, "mae": mae, "hw": "CPU/TPU",
                         "reference_cmd": REF["stat"].format(m=m, tf=tf)})


def run_rnn_task(args, rows, *, task_mode=None, new_product=0, label="",
                 ref_key=""):
    from visuelle2_tpu.cli import forecast_dl, train_dl

    dims = ["--embedding_dim", str(args.rnn_dim), "--attention_dim",
            str(args.rnn_dim), "--hidden_dim", str(args.rnn_dim)]
    ck = os.path.join(args.work_dir, "ck_" + label.replace(" ", "_"))
    sel = (["--new_product", "1"] if new_product
           else ["--task_mode", str(task_mode)])
    t0 = time.time()
    train_dl.run(train_dl.build_parser().parse_args(_common(args, dims + sel + [
        "--epochs", str(args.epochs), "--ckpt_dir", ck]
        + (["--output_len", "1"] if task_mode == 0 else []))))
    wall = time.time() - t0
    r = forecast_dl.run(forecast_dl.build_parser().parse_args(_common(
        args, dims + sel + ["--ckpt_path", ck])))
    rows.append({"row": f"{label} WAPE/MAE", "wape": r.wape, "mae": r.mae,
                 "gflops_per_sample": r.gflops_per_sample,
                 "train_wall_s": round(wall, 1), "hw": "TPU",
                 "reference_cmd": REF[ref_key]})
    if args.w8a8:
        q = forecast_dl.run(forecast_dl.build_parser().parse_args(_common(
            args, dims + sel + ["--ckpt_path", ck, "--quantize", "w8a8"])))
        rows.append(_w8a8_row(f"{label} w8a8", q, r))


def run_transformers(args, rows):
    from visuelle2_tpu.cli import forecast_transformer, train_transformer

    for m in args.models:
        ck = os.path.join(args.work_dir, f"ck_{m}")
        base = ["--model", m, "--demand", "1", "--output_len", "12",
                "--embedding_dim", str(args.emb_dim),
                "--hidden_dim", str(args.hidden_dim)]
        t0 = time.time()
        train_transformer.run(train_transformer.build_parser().parse_args(
            _common(args, base + ["--epochs", str(args.epochs),
                                  "--ckpt_dir", ck])))
        wall = time.time() - t0
        r = forecast_transformer.run(
            forecast_transformer.build_parser().parse_args(
                _common(args, base + ["--ckpt_path", ck])))
        ref_m = {"gtm": "GTM", "m4ft": "M4FT", "gated_v1": "Gated",
                 "gated_v2": "Gated_v2", "gated_v3": "Gated_v3",
                 "gated_v4": "Gated_v4"}[m]
        rows.append({"row": f"Demand {m} WAPE/MAE", "wape": r.wape,
                     "mae": r.mae, "gflops_per_sample": r.gflops_per_sample,
                     "train_wall_s": round(wall, 1), "hw": "TPU",
                     "reference_cmd": REF["transformer"].replace("{M}", ref_m)})
        if args.w8a8:
            q = forecast_transformer.run(
                forecast_transformer.build_parser().parse_args(
                    _common(args, base + ["--ckpt_path", ck,
                                          "--quantize", "w8a8"])))
            rows.append(_w8a8_row(f"Demand {m} w8a8", q, r))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--out_prefix", default="parity")
    p.add_argument("--epochs", type=int, default=50)       # train_dl.py:203
    p.add_argument("--batch_size", type=int, default=128)  # train_dl.py:191
    p.add_argument("--image_size", type=int, default=299)
    p.add_argument("--rnn_dim", type=int, default=512)     # train_dl.py:197
    p.add_argument("--emb_dim", type=int, default=32)      # GTM trainer :165
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--models", nargs="+", default=TRANSFORMER_MODELS)
    p.add_argument("--pretrained_backbone", default="",
                   help="resnet101.npz from convert_pretrained.py — REQUIRED "
                        "for a faithful comparison (the reference finetunes "
                        "pretrained weights)")
    p.add_argument("--w8a8", type=int, default=1,
                   help="also score each trained checkpoint through the "
                        "--quantize w8a8 serving engine (accuracy sign-off "
                        "rows with deltas vs the float run)")
    p.add_argument("--quick", action="store_true",
                   help="dry-run config: tiny backbone, 1 epoch, small dims")
    p.add_argument("--work_dir", default="")
    args = p.parse_args()

    if args.quick:
        args.epochs = 1
        args.batch_size = min(args.batch_size, 16)
        args.image_size = 32
        args.rnn_dim = 16
        args.emb_dim, args.hidden_dim = 16, 16
        args.models = args.models if args.models != TRANSFORMER_MODELS \
            else ["gated_v4"]
        # Self-contained dry run: generate the synthetic stand-in if the
        # path has no dataset yet (a real dataset is never touched — the
        # marker checked is the label-dict file every real dataset has).
        if not os.path.exists(
                os.path.join(args.dataset_path, "category_labels.json")) \
                and not os.path.exists(
                os.path.join(args.dataset_path, "category_labels.pt")):
            from visuelle2_tpu.data.synthetic import make_synthetic_dataset
            print(f"[quick] no dataset at {args.dataset_path}; generating "
                  "the synthetic stand-in")
            make_synthetic_dataset(args.dataset_path, num_train=64,
                                   num_test=32, image_size=args.image_size)
    elif not args.pretrained_backbone:
        print("WARNING: no --pretrained_backbone; the reference finetunes "
              "torchvision-pretrained CNNs, so WAPE/MAE will NOT be "
              "comparable (see scripts/convert_pretrained.py)")
    args.work_dir = args.work_dir or tempfile.mkdtemp(prefix="parity_")

    rows = []
    run_stats(args, rows)
    run_rnn_task(args, rows, task_mode=0, label="SO-fore2-1 CrossAttnRNN21",
                 ref_key="task0")
    run_rnn_task(args, rows, task_mode=1, label="SO-fore2-10 CrossAttnRNN210",
                 ref_key="task1")
    run_rnn_task(args, rows, new_product=1, label="Demand CrossAttnRNNDemand",
                 ref_key="demand")
    run_transformers(args, rows)

    with open(args.out_prefix + ".json", "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    lines = ["| Metric | Value | Hardware | Reference command |",
             "|---|---|---|---|"]
    for r in rows:
        val = f"{r['wape']:.3f} / {r['mae']:.3f}"
        lines.append(f"| {r['row']} | {val} | {r['hw']} | "
                     f"`{r['reference_cmd']}` |")
    md = "\n".join(lines) + "\n"
    with open(args.out_prefix + ".md", "w") as f:
        f.write(md)
    print(md)
    print(f"-> {args.out_prefix}.json / .md  (paste rows into BASELINE.md)")


if __name__ == "__main__":
    main()
