#!/bin/bash
# Round-3 continuation chain: re-establish the ERB flagship checkpoint
# (result/ was wiped between sessions), then run the queued experiments
# from tools/flagship_runbook.sh sequentially (one TPU client at a time).
set -x
cd "$(dirname "$0")/.."

PAPER="--dataset synth --synthetic_frames 132 --synthetic_hw 720 1280 \
  -e 300 --lower_width 96 --num_blocks 1 --frame_gap 1 \
  --embed 1.25_40 --stem_dim_num 512_1 --reduction 2 --fc_hw_dim 9_16_26 \
  --expansion 1 --single_res --loss Fusion6 --warmup 0.2 --lr_type cosine \
  --strides 5 2 2 2 2 --conv_type conv -b 1 --lr 0.0005 --norm none \
  --act swish --compute_dtype bfloat16"

# ---- 0. ERB flagship (writes result/q3_bf16_b1) ----
python -u -m repnerv_tpu.cli.train_main $PAPER \
  --branch_type ERB --ckpt_freq 25 --eval_freq 100 \
  --outf q3_bf16_b1 > /tmp/erb_flagship.log 2>&1
echo "=== ERB flagship done rc=$?"

# ---- 1. vanilla flagship A/B (writes result/q3_vanilla_b1) ----
python -u -m repnerv_tpu.cli.train_main $PAPER \
  --branch_type NeRV_vanilla --ckpt_freq 25 --eval_freq 100 \
  --outf q3_vanilla_b1 > /tmp/vanilla_flagship.log 2>&1
echo "=== vanilla flagship done rc=$?"

# ---- 2a. QAT PATH A 8-bit on the ERB flagship ----
python -u -m repnerv_tpu.cli.eval_main $PAPER \
  --branch_type ERB --outf q3_bf16_b1 \
  --prune_ratio 0.2 --quant_bit 8 --finetune --finetune_epochs 10 --qat \
  > /tmp/qat_flagship_q8.log 2>&1
echo "=== qat q8 done rc=$?"

# ---- 2b. QAT 6-bit ----
python -u -m repnerv_tpu.cli.eval_main $PAPER \
  --branch_type ERB --outf q3_bf16_b1 \
  --prune_ratio 0.2 --quant_bit 6 --finetune --finetune_epochs 10 --qat \
  > /tmp/qat_flagship_q6.log 2>&1
echo "=== qat q6 done rc=$?"

# ---- 2c. non-QAT 6-bit control ----
python -u -m repnerv_tpu.cli.eval_main $PAPER \
  --branch_type ERB --outf q3_bf16_b1 \
  --prune_ratio 0.2 --quant_bit 6 --finetune --finetune_epochs 10 \
  > /tmp/noqat_flagship_q6.log 2>&1
echo "=== noqat q6 done rc=$?"
echo ALL_DONE
