"""CLI flag-surface parity, experiment-id naming, cost accounting, misc."""

import numpy as np
import pytest

from repnerv_tpu.cli.args import args_to_config, build_parser, exp_id
from repnerv_tpu.config import ModelConfig, TrainConfig
from repnerv_tpu.utils.costs import generator_macs
from repnerv_tpu.utils.misc import split_channels

# the README paper command line (reference README.md:46-61), verbatim minus
# the script name; --loss (a prefix of --loss_type) must resolve like
# argparse prefix matching does in the reference (SURVEY.md §2 note)
PAPER_ARGV = (
    "-e 300 --lower_width 96 --num_blocks 1 --dataset bunny --frame_gap 1 "
    "--embed 1.25_40 --stem_dim_num 512_1 --reduction 2 --fc_hw_dim 9_16_26 "
    "--expansion 1 --single_res --loss Fusion6 --warmup 0.2 --lr_type cosine "
    "--strides 5 2 2 2 2 --conv_type conv -b 1 --lr 0.0005 --norm none "
    "--act swish"
).split()


def test_paper_argv_parses_to_paper_config():
    args = build_parser().parse_args(PAPER_ARGV + ["--branch_type", "ERB"])
    cfg = args_to_config(args)
    assert cfg.loss_type == "Fusion6"
    assert cfg.epochs == 300 and cfg.lr == 5e-4
    assert cfg.warmup_epochs() == 60
    assert cfg.model.strides == (5, 2, 2, 2, 2)
    assert cfg.model.embed_length == 80
    assert cfg.model.fc_hwd == (9, 16, 26)
    assert cfg.model.branch_type == "ERB"
    assert cfg.model.single_res and not cfg.model.sigmoid
    assert cfg.data.batch_size == 1


def test_eval_mode_flags():
    argv = PAPER_ARGV + ["--prune_ratio", "0.2", "--quant_bit", "8", "--finetune", "--finetune_epochs", "10"]
    args = build_parser(eval_mode=True).parse_args(argv)
    cfg = args_to_config(args, eval_mode=True)
    assert cfg.prune_ratio == 0.2 and cfg.quant_bit == 8
    assert cfg.finetune and cfg.finetune_epochs == 10


def test_argfile_support(tmp_path):
    f = tmp_path / "args.txt"
    f.write_text("\n".join(PAPER_ARGV))
    args = build_parser().parse_args([f"@{f}"])
    assert args.loss_type == "Fusion6"


def test_debug_flag_remaps_output():
    args = build_parser().parse_args(["--debug"])
    cfg = args_to_config(args)
    assert cfg.outf == "result/debug"
    assert cfg.eval_freq == 1


def test_exp_id_contains_hparams():
    args = build_parser().parse_args(PAPER_ARGV + ["--suffix", "run1"])
    cfg = args_to_config(args)
    s = exp_id(cfg)
    assert "bunny" in s and "embed1.25_40" in s and "Fusion6" in s
    assert "_e300_" in s and "Strd5,2,2,2,2" in s and "SinRes" in s
    assert s.endswith("_actswish_run1")


def test_config_json_roundtrip():
    args = build_parser().parse_args(PAPER_ARGV)
    cfg = args_to_config(args)
    cfg2 = TrainConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_generator_macs_paper_config():
    """Deploy MACs for the paper config; dominated by stage 5:
    9*96*384*360*640 = 76.5 GMACs.  Total ~101 GMACs/frame."""
    cfg = ModelConfig()  # paper defaults
    macs = generator_macs(cfg, deploy=True)["macs"]
    assert 9.5e10 < macs < 1.1e11, macs
    # ERB train graph costs more than deploy
    erb = generator_macs(ModelConfig(branch_type="ERB"), deploy=False)["macs"]
    assert erb > 2 * macs


def test_split_channels():
    assert split_channels(13, 6) == [3, 2, 2, 2, 2, 2]
    assert split_channels(12, 6) == [2, 2, 2, 2, 2, 2]
    assert sum(split_channels(100, 7)) == 100


def test_uvg_1080p_config_shapes():
    """BASELINE.md config 5: UVG 1080p with scaled fc_hw_dim; the schedule
    must produce 1080x1920 with NeRV's standard 1080p strides."""
    from repnerv_tpu.config import output_hw, stage_channels

    cfg = ModelConfig(fc_hw_dim="9_16_48", strides=(5, 3, 2, 2, 2), lower_width=96)
    assert output_hw(cfg) == (1080, 1920)
    plan = stage_channels(cfg)
    assert plan[0] == (48, 48, 5)
    assert all(c >= 96 for _, c, _ in plan[1:])


def test_outofcore_metal_log_parser():
    """tools/outofcore_metal.py's collector must track the EXACT rank0.txt
    line shape train_main emits (ops/metrics.py round_tensor: bare
    comma-joined floats, no brackets) — a drifted format silently records
    runs with no epoch data."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ooc_metal", os.path.join(repo, "tools", "outofcore_metal.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from repnerv_tpu.ops.metrics import round_tensor

    psnr = round_tensor(np.asarray([12.345, 13.456]), 2)
    line1 = (
        f"[2026/08/20 23:55:01] Epoch[1/30] lr:1.23e-04 PSNR: {psnr} "
        "MSSSIM: 0.12,0.23 Time/epoch: Current:123.45 Average:123.45"
    )
    line2 = (
        "[2026/08/20 23:55:05] Epoch[2/30] lr:2.23e-04 PSNR: 15.0,16.5 "
        "MSSSIM: 0.2,0.3 Time/epoch: Current:3.31 Average:63.4"
    )
    spill = "frame store: video is 365 MiB, over the HBM pixel budget"
    ev = f"Eval at epoch 30: PSNR {round_tensor(np.asarray([18.2, 19.9]), 2)}"
    row = mod.parse_log("\n".join([line1, spill, line2, ev]))
    assert row["epoch1_s"] == 123.45
    assert row["steady_s_per_epoch"] == 3.31
    assert row["final_train_psnr"] == 16.5
    assert row["final_eval_psnr"] == 19.9
    assert row["spill_msg"].startswith("frame store:")
