#!/bin/bash
# Flagship experiment runbook — the exact on-chip commands behind the
# numbers in BENCHMARKS.md, plus the queued round-3 experiments (run ONE
# at a time; the tunnel serves a single client).
# 1) NeRV_vanilla flagship A/B (~25 min): BASELINE.md lists both
#    branch_type configs; isolates the online-reparam quality gain.
# 2) QAT flagship evals against the existing 31.19 dB ERB checkpoint
#    (result/q3_bf16_b1): PATH A 8-bit with --qat, and 6-bit QAT vs
#    non-QAT (the BPP claim; see BENCHMARKS.md QAT section).
set -x
cd "$(dirname "$0")/.."

PAPER="--dataset synth --synthetic_frames 132 --synthetic_hw 720 1280 \
  -e 300 --lower_width 96 --num_blocks 1 --frame_gap 1 \
  --embed 1.25_40 --stem_dim_num 512_1 --reduction 2 --fc_hw_dim 9_16_26 \
  --expansion 1 --single_res --loss Fusion6 --warmup 0.2 --lr_type cosine \
  --strides 5 2 2 2 2 --conv_type conv -b 1 --lr 0.0005 --norm none \
  --act swish --compute_dtype bfloat16"

# ---- 1. vanilla flagship (writes result/q3_vanilla_b1) ----
python -u -m repnerv_tpu.cli.train_main $PAPER \
  --branch_type NeRV_vanilla --ckpt_freq 25 --eval_freq 100 \
  --outf q3_vanilla_b1 > /tmp/vanilla_flagship.log 2>&1

# ---- 2a. QAT PATH A 8-bit on the ERB flagship ----
python -u -m repnerv_tpu.cli.eval_main $PAPER \
  --branch_type ERB --outf q3_bf16_b1 \
  --prune_ratio 0.2 --quant_bit 8 --finetune --finetune_epochs 10 --qat \
  > /tmp/qat_flagship_q8.log 2>&1

# ---- 2b. QAT 6-bit (the BPP-reduction claim) ----
python -u -m repnerv_tpu.cli.eval_main $PAPER \
  --branch_type ERB --outf q3_bf16_b1 \
  --prune_ratio 0.2 --quant_bit 6 --finetune --finetune_epochs 10 --qat \
  > /tmp/qat_flagship_q6.log 2>&1

# ---- 2c. non-QAT 6-bit control ----
python -u -m repnerv_tpu.cli.eval_main $PAPER \
  --branch_type ERB --outf q3_bf16_b1 \
  --prune_ratio 0.2 --quant_bit 6 --finetune --finetune_epochs 10 \
  > /tmp/noqat_flagship_q6.log 2>&1
echo ALL_DONE
