"""Host-side ray-batch samplers (reference: sampler.py:4-38)."""
from __future__ import annotations

import numpy as np


class SimpleSampler:
    """Shuffled-permutation batches over a flat ray buffer."""

    def __init__(self, total: int, batch: int, seed: int = 0):
        self.total = int(total)
        self.batch = int(batch)
        self.curr = self.total
        self.ids = None
        self.rng = np.random.default_rng(seed)

    def nextids(self) -> np.ndarray:
        self.curr += self.batch
        if self.curr + self.batch > self.total:
            self.ids = self.rng.permutation(self.total)
            self.curr = 0
        return self.ids[self.curr : self.curr + self.batch]


class ThetaImportanceSampler:
    """Latitude-weighted pixel sampling: equirect images oversample the
    poles, so rows are drawn with weight lambda*cos(theta)+1
    (reference: sampler.py:19-38)."""

    def __init__(self, theta_importance_lambda: float, img_len: int, img_wh,
                 batch: int, roi, seed: int = 0):
        self.img_len = int(img_len)
        self.batch = int(batch)
        w, h = img_wh
        self.w = int(w * (roi[3] - roi[2]))
        self.h = int(h * (roi[1] - roi[0]))
        self.weight = self._get_weight(theta_importance_lambda, h, roi)
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def _get_weight(lam: float, h: int, roi) -> np.ndarray:
        rows = np.arange(h)[int(h * roi[0]) : int(h * roi[1])]
        theta = -(rows - h // 2) / h * np.pi
        weight = np.cos(theta) * lam + 1.0
        return weight / weight.sum()

    def nextids(self) -> np.ndarray:
        img_id = self.rng.choice(self.img_len, self.batch)
        col = self.rng.choice(self.w, self.batch)
        row = self.rng.choice(self.h, self.batch, p=self.weight)
        return img_id * self.w * self.h + (col + row * self.w)
