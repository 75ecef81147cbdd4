"""Image quality metrics.

PSNR + Gaussian-window SSIM implemented in numpy/scipy (the same
construction as the mipnerf SSIM the reference vendors —
reference: utils.py:106-152 — re-derived here, not ported line-by-line),
plus the weighted-sphere SSIM for equirect panoramas
(reference: extra/ws_ssim.py:26-33) which the reference only shipped as an
offline tool.  LPIPS is gated on the optional ``lpips`` package; absent in
this image, callers receive None.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.signal


def mse2psnr(mse: float) -> float:
    return float(-10.0 * np.log(mse) / np.log(10.0))


def psnr(img0: np.ndarray, img1: np.ndarray) -> float:
    return mse2psnr(float(np.mean((np.asarray(img0) - np.asarray(img1)) ** 2)))


def _ssim_map(img0: np.ndarray, img1: np.ndarray, max_val: float = 1.0,
              filter_size: int = 11, filter_sigma: float = 1.5,
              k1: float = 0.01, k2: float = 0.03) -> np.ndarray:
    """Per-pixel SSIM with a separable Gaussian window ('valid' support)."""
    img0 = np.asarray(img0, np.float64)
    img1 = np.asarray(img1, np.float64)
    assert img0.ndim == 3 and img0.shape[-1] == 3 and img0.shape == img1.shape

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    t = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    win = np.exp(-0.5 * t)
    win /= win.sum()

    if filter_size % 2:  # fast path: ndimage's C 1-D correlate, all
        # channels at once, then crop to 'valid' (~20x vs convolve2d on
        # the 1-core host: 4.8 s -> 0.25 s per 1000x2000 image)
        import scipy.ndimage

        def blur(z):
            z = scipy.ndimage.convolve1d(z, win, axis=0, mode="constant")
            z = scipy.ndimage.convolve1d(z, win, axis=1, mode="constant")
            return z[hw:-hw or None, hw:-hw or None]
    else:  # even windows need the mipnerf half-shift; keep the exact form
        def blur(z):
            return np.stack(
                [scipy.signal.convolve2d(
                    scipy.signal.convolve2d(z[..., c], win[:, None], mode="valid"),
                    win[None, :], mode="valid")
                 for c in range(z.shape[-1])], -1)

    mu0, mu1 = blur(img0), blur(img1)
    s00 = np.maximum(blur(img0 ** 2) - mu0 ** 2, 0.0)
    s11 = np.maximum(blur(img1 ** 2) - mu1 ** 2, 0.0)
    s01 = blur(img0 * img1) - mu0 * mu1
    s01 = np.sign(s01) * np.minimum(np.sqrt(s00 * s11), np.abs(s01))
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    return ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / (
        (mu0 ** 2 + mu1 ** 2 + c1) * (s00 + s11 + c2))


def rgb_ssim(img0, img1, max_val: float = 1.0, **kw) -> float:
    return float(np.mean(_ssim_map(img0, img1, max_val, **kw)))


def ws_psnr(img0: np.ndarray, img1: np.ndarray) -> float:
    """Weighted-sphere PSNR: squared error averaged with cos(latitude)
    weights (the reference left this as a TODO, renderer.py:89)."""
    img0, img1 = np.asarray(img0, np.float64), np.asarray(img1, np.float64)
    h = img0.shape[0]
    lat = ((np.arange(h) + 0.5) / h - 0.5) * np.pi
    w = np.cos(lat)[:, None, None]
    mse = float(np.sum(w * (img0 - img1) ** 2) / (np.sum(w) * img0.shape[1] * img0.shape[2]))
    return mse2psnr(mse)


def ws_ssim(img0, img1, max_val: float = 1.0, **kw) -> float:
    """Weighted-sphere SSIM: the per-pixel SSIM map averaged with
    cos(latitude) weights so the over-represented poles of an equirect
    image do not dominate (reference: extra/ws_ssim.py:16-33)."""
    smap = _ssim_map(img0, img1, max_val, **kw)
    h = smap.shape[0]
    rows = (np.arange(h) + 0.5) / h  # in (0, 1) top->bottom
    lat = (rows - 0.5) * np.pi
    w = np.cos(lat)[:, None, None]
    return float(np.sum(smap * w) / (np.sum(w) * smap.shape[1] * smap.shape[2]))


_LPIPS_CACHE: dict = {}


def rgb_lpips(np_gt: np.ndarray, np_im: np.ndarray, net_name: str = "alex",
              device: str = "cpu") -> Optional[float]:
    """LPIPS perceptual distance; returns None when neither a local
    weights file (render/lpips_jax.py discovery path) nor the optional
    torch lpips package is available (reference: utils.py:77-92)."""
    from .lpips_jax import rgb_lpips_jax

    v = rgb_lpips_jax(np_gt, np_im, net_name)
    if v is not None:
        return v
    try:
        import torch
        import lpips  # type: ignore
    except Exception:
        return None
    if net_name not in _LPIPS_CACHE:
        try:
            _LPIPS_CACHE[net_name] = lpips.LPIPS(net=net_name, version="0.1").eval()
        except Exception:
            return None
    model = _LPIPS_CACHE[net_name]
    gt = torch.from_numpy(np.asarray(np_gt, np.float32)).permute(2, 0, 1)
    im = torch.from_numpy(np.asarray(np_im, np.float32)).permute(2, 0, 1)
    with torch.no_grad():
        return float(model(gt, im, normalize=True).item())
