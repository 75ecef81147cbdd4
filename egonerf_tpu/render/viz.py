"""Visualization helpers: depth colormap without an OpenCV dependency.

(reference: utils.py:14-27 uses cv2.applyColorMap(JET); here the jet
colormap is evaluated analytically.)
"""
from __future__ import annotations

import numpy as np


def _jet(x: np.ndarray) -> np.ndarray:
    """x in [0,1] -> (..., 3) uint8 classic jet colormap."""
    x = np.clip(x, 0.0, 1.0)
    four = 4.0 * x
    r = np.clip(np.minimum(four - 1.5, -four + 4.5), 0, 1)
    g = np.clip(np.minimum(four - 0.5, -four + 3.5), 0, 1)
    b = np.clip(np.minimum(four + 0.5, -four + 2.5), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def visualize_depth(depth: np.ndarray, minmax=None):
    """(H, W) depth -> (H, W, 3) uint8 heat map + the [mi, ma] range used."""
    x = np.nan_to_num(np.asarray(depth, np.float32))
    if minmax is None:
        positive = x[x > 0]
        mi = float(positive.min()) if positive.size else 0.0
        ma = float(x.max())
    else:
        mi, ma = float(minmax[0]), float(minmax[1])
    x = (x - mi) / (ma - mi + 1e-8)
    return _jet(x), [mi, ma]


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)
