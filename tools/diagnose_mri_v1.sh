#!/bin/bash
# Diagnose the 150-epoch corpus-suite video-4 collapse (MRI variant 1,
# content seed 5: 6.96 dB post-quant vs 35.86 dB for MRI variant 0 —
# BENCHMARKS "UVG-1080p 7-video suite" run 2).
#
# Reproduces that one suite video standalone via --content_seed (the flag
# added for exactly this), with per-epoch train PSNR so the collapse onset
# is visible, then evals the 8-bit quant path like the suite did.
# The standalone run inits from PRNGKey(manual_seed), NOT the suite's
# vkeys[4] split — so:
#   * if it ALSO collapses -> content-driven dynamics, reproducible
#   * if it trains fine    -> init-key sensitivity (one bad draw in 14)
set -x
cd "$(dirname "$0")/.."

GEOM="--dataset corpus --content_seed 5 --synthetic_frames 96 \
  --synthetic_hw 1080 1920 --lower_width 96 --num_blocks 1 --frame_gap 1 \
  --embed 1.25_40 --stem_dim_num 512_1 --reduction 2 --fc_hw_dim 9_16_48 \
  --expansion 1 --single_res --loss Fusion6 --warmup 0.2 --lr_type cosine \
  --strides 5 3 2 2 2 --conv_type conv -b 1 --lr 0.0005 --norm none \
  --act swish --compute_dtype bfloat16 --branch_type ERB"

python -u -m repnerv_tpu.cli.train_main $GEOM -e 150 \
  --ckpt_freq 150 --eval_freq 150 --outf diag_mri_v1 \
  > /tmp/diag_mri_v1.log 2>&1
echo "=== train done rc=$?"
grep -E "Epoch\[(1|10|20|30|40|50|75|100|125|150)/150\]" /tmp/diag_mri_v1.log

python -u -m repnerv_tpu.cli.eval_main $GEOM -e 150 \
  --outf diag_mri_v1 --quant_bit 8 --prune_ratio 1.0 \
  > /tmp/diag_mri_v1_eval.log 2>&1
echo "=== eval done rc=$?"
tail -5 /tmp/diag_mri_v1_eval.log
