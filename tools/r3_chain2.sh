#!/bin/bash
# Round-3 continuation chain #2: quality-headline experiments.
# 1) 600-epoch b=1 ERB flagship — epochs as the next quality dial on top of
#    steps/epoch (BENCHMARKS "Longer-schedule point" only had b=8).
# 2) 1080p b=1 ERB flagship, 300 epochs — upgrades the round-2 "geometry
#    proof" (60-epoch b=8) into a real 1080p quality claim.
set -x
cd "$(dirname "$0")/.."

PAPER="--dataset synth --synthetic_frames 132 --synthetic_hw 720 1280 \
  -e 600 --lower_width 96 --num_blocks 1 --frame_gap 1 \
  --embed 1.25_40 --stem_dim_num 512_1 --reduction 2 --fc_hw_dim 9_16_26 \
  --expansion 1 --single_res --loss Fusion6 --warmup 0.2 --lr_type cosine \
  --strides 5 2 2 2 2 --conv_type conv -b 1 --lr 0.0005 --norm none \
  --act swish --compute_dtype bfloat16"

# ---- 1. 600-epoch flagship (writes result/q3_bf16_b1_e600) ----
python -u -m repnerv_tpu.cli.train_main $PAPER \
  --branch_type ERB --ckpt_freq 50 --eval_freq 200 \
  --outf q3_bf16_b1_e600 > /tmp/erb_e600.log 2>&1
echo "=== e600 done rc=$?"

# ---- 2. 1080p b=1 flagship, 300 epochs (writes result/q3_1080_b1) ----
P1080="--dataset synth --synthetic_frames 96 --synthetic_hw 1080 1920 \
  -e 300 --lower_width 96 --num_blocks 1 --frame_gap 1 \
  --embed 1.25_40 --stem_dim_num 512_1 --reduction 2 --fc_hw_dim 9_16_48 \
  --expansion 1 --single_res --loss Fusion6 --warmup 0.2 --lr_type cosine \
  --strides 5 3 2 2 2 --conv_type conv -b 1 --lr 0.0005 --norm none \
  --act swish --compute_dtype bfloat16"
python -u -m repnerv_tpu.cli.train_main $P1080 \
  --branch_type ERB --ckpt_freq 50 --eval_freq 100 \
  --outf q3_1080_b1 > /tmp/erb_1080_b1.log 2>&1
echo "=== 1080p b=1 done rc=$?"

# ---- 3. compress the 600-epoch flagship (PATH A, 8-bit) ----
python -u -m repnerv_tpu.cli.eval_main $PAPER \
  --branch_type ERB --outf q3_bf16_b1_e600 \
  --prune_ratio 0.2 --quant_bit 8 --finetune --finetune_epochs 10 \
  > /tmp/e600_compress.log 2>&1
echo "=== e600 compress done rc=$?"
echo ALL_DONE2
