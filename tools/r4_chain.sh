#!/bin/bash
# Round-4 on-chip measurement chain (run when the chip is free; one TPU
# client at a time):
#   1. A/B the fused epilogue-backward kernel on the shipped b=1 step
#   2. flagship 300-epoch -b 1 re-run with the fused backward (<=19 min
#      at >=31.1 dB is the VERDICT r3 target)
#   3. parallel-mode suite on metal (2 corpus videos vmapped on the chip)
#      vs the identical sequential run — the parallel mode's first
#      on-metal wall-clock number
set -x
cd "$(dirname "$0")/.."

# ---- 1. fused-bwd A/B (writes results/profile_fused_bwd_ab.json) ----
python -u tools/profile_fused_bwd_ab.py > /tmp/fused_ab.log 2>&1
echo "=== fused-bwd A/B done rc=$?"
cat results/profile_fused_bwd_ab.json

PAPER="--dataset synth --synthetic_frames 132 --synthetic_hw 720 1280 \
  -e 300 --lower_width 96 --num_blocks 1 --frame_gap 1 \
  --embed 1.25_40 --stem_dim_num 512_1 --reduction 2 --fc_hw_dim 9_16_26 \
  --expansion 1 --single_res --loss Fusion6 --warmup 0.2 --lr_type cosine \
  --strides 5 2 2 2 2 --conv_type conv -b 1 --lr 0.0005 --norm none \
  --act swish --compute_dtype bfloat16"

# ---- 2. flagship with the fused backward (writes result/q4_fusedbwd) ----
python -u -m repnerv_tpu.cli.train_main $PAPER \
  --branch_type ERB --ckpt_freq 50 --eval_freq 100 \
  --outf q4_fusedbwd > /tmp/flagship_r4.log 2>&1
echo "=== flagship (fused bwd) done rc=$?"
grep -E "Epoch\[300/300\]|TrainBest" /tmp/flagship_r4.log | tail -3

SUITE="--dataset corpus --synthetic_frames 48 --synthetic_hw 720 1280 \
  -e 30 --lower_width 96 --num_blocks 1 --frame_gap 1 \
  --embed 1.25_40 --stem_dim_num 512_1 --reduction 2 --fc_hw_dim 9_16_26 \
  --expansion 1 --single_res --loss Fusion6 --warmup 0.2 --lr_type cosine \
  --strides 5 2 2 2 2 --conv_type conv -b 1 --lr 0.0005 --norm none \
  --act swish --compute_dtype bfloat16 --branch_type ERB --n_videos 2"

# ---- 3a. parallel mode on metal (2 videos vmapped on one chip) ----
python -u -m repnerv_tpu.cli.suite_main $SUITE --suite_mode parallel \
  --outf suite_par_metal --suite_out results/suite_parallel_metal.json \
  > /tmp/suite_par.log 2>&1
echo "=== parallel suite done rc=$?"

# ---- 3b. identical sequential run for the wall-clock comparison ----
python -u -m repnerv_tpu.cli.suite_main $SUITE --suite_mode sequential \
  --outf suite_seq_metal --suite_out results/suite_sequential_metal.json \
  > /tmp/suite_seq.log 2>&1
echo "=== sequential suite done rc=$?"
python - <<'EOF'
import json
for n in ("parallel", "sequential"):
    d = json.load(open(f"results/suite_{n}_metal.json"))
    print(n, "fit_seconds", round(d["fit_seconds"], 1),
          "mean_psnr", round(d["mean_psnr"], 2))
EOF
