#!/usr/bin/env bash
# Example launches (counterpart of the reference's launchers.sh) — all three
# benchmark tasks plus the transformer family, against a VISUELLE2 dataset dir.
set -e
DATA=${1:-../visuelle2}

# SO-fore 2-1
python -m visuelle2_tpu.cli.train_dl --dataset_path "$DATA" --task_mode 0 --output_len 1 --ckpt_dir ckpt_21
python -m visuelle2_tpu.cli.forecast_dl --dataset_path "$DATA" --task_mode 0 --ckpt_path ckpt_21

# SO-fore 2-10 (teacher forcing on in training)
python -m visuelle2_tpu.cli.train_dl --dataset_path "$DATA" --task_mode 1 --output_len 10 --use_teacher_forcing --ckpt_dir ckpt_210
python -m visuelle2_tpu.cli.forecast_dl --dataset_path "$DATA" --task_mode 1 --ckpt_path ckpt_210

# Demand (new product) — CrossAttnRNN
python -m visuelle2_tpu.cli.train_dl --dataset_path "$DATA" --demand 1 --ckpt_dir ckpt_demand
python -m visuelle2_tpu.cli.forecast_dl --dataset_path "$DATA" --new_product 1 --ckpt_path ckpt_demand

# Demand — transformer family (GTM / M4FT / Gated v1-v4)
for M in gtm m4ft gated_v1 gated_v2 gated_v3 gated_v4; do
  python -m visuelle2_tpu.cli.train_transformer --dataset_path "$DATA" --model "$M" --ckpt_dir "ckpt_$M"
  python -m visuelle2_tpu.cli.forecast_transformer --dataset_path "$DATA" --model "$M" --ckpt_path "ckpt_$M"
done

# Statistical baselines
for S in naive ses holt; do
  python -m visuelle2_tpu.cli.forecast_stat --dataset_path "$DATA" --method "$S" --use_teacher_forcing 1
done
