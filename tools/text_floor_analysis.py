"""Is the text corpus class fittable, or does the generator alias it into
temporal noise?  (VERDICT r4 weak #3 / next #2.)

The 150-epoch 1080p corpus suite scored text at 12.28 dB / MS-SSIM 0.11 —
indistinguishable from noise.  Three hypotheses:
  (a) genuine NeRV capacity limits on scrolling glyphs,
  (b) the generator creates unfittable content: `_camera_pan_video`
      bilinear-resizes the mirror-tiled 22-px glyph page EVERY frame at a
      continuously varying zoom (1.09-1.15), so 1-2 px glyph strokes land on
      a different subpixel phase each frame -> temporal shimmer,
  (c) schedule/capacity underfit at 150 epochs.

This tool measures (b) directly on CPU, no training: per-class
adjacent-frame residuals at the suite geometry (96f 1080x1920), plus text
variants that isolate the resample.  A video whose adjacent frames differ
by ~noise cannot be represented by ANY smooth-in-t model at high PSNR;
temporal-residual magnitude bounds what overfitting can achieve.

Outputs one JSON to results/text_floor_analysis.json.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")
from repnerv_tpu.data.frames import (  # noqa: E402
    CORPUS_CLASSES,
    _camera_pan_video,
    _mirror_tile,
    _src_text,
    corpus_video,
)


def residual_stats(frames: np.ndarray) -> dict:
    """Fittability statistics in /255 units.

    * copy_prev_psnr_db — PSNR of the zero-parameter copy-previous-frame
      predictor: a temporal-coherence proxy.
    * mean_frame_psnr_db — PSNR of predicting EVERY frame with the temporal
      mean frame: what a model that only learns the DC achieves.  The
      150-epoch suite scored text at 12.28 dB; if that matches this bound,
      the model learned (roughly) the average page, nothing temporal.
    * temporal_hf_share — fraction of per-pixel temporal-FFT energy in the
      top half of the band (>= Nyquist/2), mean over pixels (on a spatial
      subsample for memory).  Near-Nyquist trajectories cannot be
      represented smoothly in t by ANY coordinate model at this frame rate.
    * spatial_downup_psnr_db — PSNR of bilinear 2x down->up per frame:
      spatial compressibility (how much of the energy is at the finest
      scale).
    """
    f = frames.astype(np.float32) / 255.0
    d = np.abs(f[1:] - f[:-1])
    mse_prev = float(np.mean((f[1:] - f[:-1]) ** 2))
    mean_frame = f.mean(axis=0, keepdims=True)
    mse_mean = float(np.mean((f - mean_frame) ** 2))
    # per-pixel temporal spectrum on an 8x8 spatial subsample (gray)
    g = f[:, ::8, ::8, :].mean(-1)
    spec = np.abs(np.fft.rfft(g - g.mean(0, keepdims=True), axis=0)) ** 2
    k = spec.shape[0]
    hf_share = float(spec[k // 2 :].sum() / max(spec.sum(), 1e-12))
    # spatial 2x down-up (box down, bilinear-ish up via repeat+avg is crude;
    # use simple 2x2 mean down and nearest up — a conservative bound)
    n, h, w, c = f.shape
    f2 = f[:, : h - h % 2, : w - w % 2]
    down = f2.reshape(n, h // 2, 2, w // 2, 2, c).mean((2, 4))
    up = np.repeat(np.repeat(down, 2, axis=1), 2, axis=2)
    mse_sp = float(np.mean((f2 - up) ** 2))
    return {
        "mean_abs": float(d.mean()),
        "p99_abs": float(np.percentile(d, 99)),
        "copy_prev_psnr_db": float(-10.0 * np.log10(max(mse_prev, 1e-12))),
        "mean_frame_psnr_db": float(-10.0 * np.log10(max(mse_mean, 1e-12))),
        "temporal_hf_share": hf_share,
        "spatial_downup_psnr_db": float(-10.0 * np.log10(max(mse_sp, 1e-12))),
        "frame_std": float(f.std()),
    }


def text_no_resample(n_frames: int, h: int, w: int, seed: int) -> np.ndarray:
    """The same text content through an integer-pixel camera: crop exactly
    (h, w) from the tiled canvas along the same smooth pan path, zoom
    locked at 1 -> NO per-frame resize.  Isolates the bilinear resample."""
    src = _src_text(seed // len(CORPUS_CLASSES))
    canvas = _mirror_tile(src, h, w)
    rng = np.random.default_rng(seed)
    ph = rng.uniform(0, 2 * np.pi, size=4)
    ch, cw = canvas.shape[:2]
    pan_y, pan_x = 0.08 * h, 0.08 * w
    cy0, cx0 = (ch - int(h * 1.25)) // 2, (cw - int(w * 1.25)) // 2
    frames = np.empty((n_frames, h, w, 3), np.uint8)
    for n in range(n_frames):
        t = n / max(n_frames, 1)
        y0 = int(np.clip(cy0 + pan_y * np.sin(2 * np.pi * t + ph[1]), 0, ch - h))
        x0 = int(np.clip(cx0 + pan_x * np.sin(2 * np.pi * t + ph[2]), 0, cw - w))
        frames[n] = canvas[y0 : y0 + h, x0 : x0 + w]
    return frames


def main() -> None:
    n, h, w = 96, 1080, 1920
    out: dict = {"geometry": [n, h, w], "classes": {}}
    # suite seeds 1..4 -> mri, terrain, text, photo
    for seed, cls in ((4, "photo"), (1, "mri"), (2, "terrain"), (3, "text")):
        frames, _ = corpus_video(n, h, w, seed=seed)
        out["classes"][cls] = residual_stats(frames)
        del frames
    out["text_no_resample"] = residual_stats(text_no_resample(n, h, w, 3))
    # text through the standard camera but with zoom variation removed
    # (constant 1.12 -> one fixed resample ratio, subpixel phase still
    # drifts with the pan): separates zoom-churn from any resample at all
    src = _src_text(0)
    canvas = _mirror_tile(src, h, w)

    frames_fixed, _ = _camera_pan_video(
        canvas, n, h, w, np.random.default_rng(3), max_zoom=1.25
    )
    del frames_fixed  # same as corpus text; regenerate not needed
    with open("results/text_floor_analysis.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
