#!/bin/bash
# Round-5 head-to-head arm extension (VERDICT r4 item 3): bring both TPU arms
# to n>=10 seeds under the EXACT committed protocol (HEADTOHEAD.json):
# CpnU22 order=5 samples=32, 32 train / 16 val @ 256^2, adam 5e-4, batch 8,
# 60 epochs = 240 steps, precision default, TPU chip.
set -u
cd /root/repo
PROTO="--size 256 --n-train 32 --n-val 16 --lr 5e-4 --batch-size 8 --epochs 60"
for seed in 4 5 6 7 8; do
  d=/tmp/h2h_r5_native$seed
  [ -f $d/tpu_results.json ] && { echo "skip native $seed"; continue; }
  echo "=== native seed $seed"
  timeout 2400 python scripts/head_to_head.py --stage tpu --seed $seed $PROTO \
      --out-dir $d 2>&1 | tail -2
done
for seed in 3 4 5 6 7 8 9; do
  d=/tmp/h2h_r5_refinit$seed
  [ -f $d/tpu_results.json ] && { echo "skip refinit $seed"; continue; }
  echo "=== refinit seed $seed"
  timeout 2400 python scripts/head_to_head.py --stage tpu --seed $seed $PROTO \
      --ref-init --out-dir $d 2>&1 | tail -2
done
echo ALL_DONE
