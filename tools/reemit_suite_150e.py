"""Re-emit results/uvg_suite_1080p_150e.json with suite video 4 (the
init-draw collapse, 6.96 dB) replaced by its refit (VERDICT r4 next #1d).

The refit is the standalone `--content_seed 5` rerun at the identical
150-epoch 1080p recipe with a fresh init draw (`tools/diagnose_mri_v1.sh`,
`result/diag_mri_v1`): train 35.85 dB, 8-bit quant eval 35.84 dB / MS-SSIM
0.9833 / BPP 0.2068 — the same measurement path the suite rows use
(`cli/suite_main.py _measure_video` ≡ eval CLI PATH at prune 1.0/quant 8).
Provenance is recorded IN the row (a `refit` block mirroring the auto-
refit format the suite driver now writes) so the artifact states exactly
what was re-run and why; the original collapsed row is preserved under
`refit.initial_row`.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    suite_path = os.path.join(REPO, "results", "uvg_suite_1080p_150e.json")
    diag_eval = os.path.join(REPO, "result", "diag_mri_v1", "only_prune1.00_quant8.txt")
    with open(diag_eval) as f:
        row_json = [ln for ln in f if ln.startswith("{")][-1]
    ev = json.loads(row_json)
    suite = json.load(open(suite_path))
    old = suite["videos"][4]
    assert old["video"] == 4 and old["psnr"] < 8.0, "already re-emitted?"
    new = {
        "video": 4,
        "bpp": ev["bpp"],
        "efficiency": ev["efficiency"],
        "psnr": ev["val_psnr"][-1],
        "msssim": ev["val_msssim"][-1],
        "train_psnr": 35.85,  # result/diag_mri_v1/rank0.txt epoch 150
        "refit": {
            "initial_row": old,
            "reason": "init-draw collapse (BENCHMARKS 'MRI variant-1 collapse')",
            "source": "result/diag_mri_v1 (tools/diagnose_mri_v1.sh: standalone "
            "--content_seed 5, identical recipe, fresh init key)",
            "attempts": 1,
        },
    }
    rnvb = os.path.join(REPO, "result", "diag_mri_v1", "model_pr1.00_q8.rnvb")
    if os.path.exists(rnvb):
        new["rnvb"] = os.path.relpath(rnvb, REPO)
        new["rnvb_bytes"] = os.path.getsize(rnvb)
    suite["videos"][4] = new
    n = len(suite["videos"])
    suite["mean_psnr"] = sum(r["psnr"] for r in suite["videos"]) / n
    suite["mean_msssim"] = sum(r["msssim"] for r in suite["videos"]) / n
    suite["mean_bpp"] = sum(r["bpp"] for r in suite["videos"]) / n
    suite["revision"] = (
        "round 5: video 4 replaced by its refit after the recorded init-draw "
        "collapse; all other rows are the original round-4 fits"
    )
    json.dump(suite, open(suite_path, "w"), indent=1)
    print(
        f"re-emitted: video4 {old['psnr']:.2f} -> {new['psnr']:.2f} dB, "
        f"mean {suite['mean_psnr']:.2f} dB / {suite['mean_msssim']:.4f}"
    )


if __name__ == "__main__":
    main()
