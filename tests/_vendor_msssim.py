"""Test-side vendored implementation of the ``pytorch_msssim`` algorithm.

The reference depends on the ``pytorch_msssim`` package (reference
utils.py:9), which is not installed in this image.  This module
re-implements the package's functional ``ssim``/``ms_ssim`` (the standard
Wang et al. MS-SSIM with the package's exact conventions: separable
gaussian window size 11 / sigma 1.5, VALID convolution, K=(0.01, 0.03),
relu on intermediate cs terms, avg_pool2d(kernel=2, padding=H%2/W%2)
downsampling, weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)) so that

* reference ``utils.py`` can be imported for cross-framework parity tests
  (``sys.modules['pytorch_msssim'] = this module``), and
* ``repnerv_tpu.ops.ssim`` has an independent torch golden to verify
  against (it was previously only checked against an in-repo numpy mirror).

Used by tests only — never imported by the library.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F


def _gaussian_1d(size: int, sigma: float) -> torch.Tensor:
    coords = torch.arange(size, dtype=torch.float32) - size // 2
    g = torch.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return g.reshape(1, 1, size)


def _gaussian_filter(x: torch.Tensor, win: torch.Tensor) -> torch.Tensor:
    """Separable depthwise VALID gaussian blur over the two spatial dims."""
    c = x.shape[1]
    out = F.conv2d(x, win.expand(c, 1, 1, -1), groups=c)
    out = F.conv2d(out, win.expand(c, 1, 1, -1).transpose(2, 3), groups=c)
    return out


def _ssim_per_channel(x, y, win, data_range, k):
    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2

    cs_map = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return torch.flatten(ssim_map, 2).mean(-1), torch.flatten(cs_map, 2).mean(-1)


def ssim(
    X: torch.Tensor,
    Y: torch.Tensor,
    data_range: float = 255,
    size_average: bool = True,
    win_size: int = 11,
    win_sigma: float = 1.5,
    K=(0.01, 0.03),
    **_ignored,
) -> torch.Tensor:
    win = _gaussian_1d(win_size, win_sigma).to(X.device, X.dtype)
    ssim_pc, _ = _ssim_per_channel(X, Y, win, float(data_range), K)
    return ssim_pc.mean() if size_average else ssim_pc.mean(1)


def ms_ssim(
    X: torch.Tensor,
    Y: torch.Tensor,
    data_range: float = 255,
    size_average: bool = True,
    win_size: int = 11,
    win_sigma: float = 1.5,
    weights=None,
    K=(0.01, 0.03),
    **_ignored,
) -> torch.Tensor:
    if weights is None:
        weights = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]
    weights_t = torch.tensor(weights, device=X.device, dtype=X.dtype)
    levels = weights_t.shape[0]
    smaller = min(X.shape[-2], X.shape[-1])
    assert smaller > (win_size - 1) * 2 ** (levels - 1), (
        f"image too small ({smaller}) for {levels}-level ms-ssim"
    )
    win = _gaussian_1d(win_size, win_sigma).to(X.device, X.dtype)

    mcs = []
    ssim_pc = None
    for i in range(levels):
        ssim_pc, cs = _ssim_per_channel(X, Y, win, float(data_range), K)
        if i < levels - 1:
            mcs.append(torch.relu(cs))
            padding = [s % 2 for s in X.shape[2:]]
            X = F.avg_pool2d(X, kernel_size=2, padding=padding)
            Y = F.avg_pool2d(Y, kernel_size=2, padding=padding)

    ssim_pc = torch.relu(ssim_pc)
    stack = torch.stack(mcs + [ssim_pc], dim=0)  # (levels, batch, channel)
    ms = torch.prod(stack ** weights_t.view(-1, 1, 1), dim=0)
    return ms.mean() if size_average else ms.mean(1)
