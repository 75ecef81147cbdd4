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


def make_device_id_sampler(sampler, batch_size: int, n_total: int):
    """Build a traced ``fn(key) -> (batch,) int32`` drawing flat ray ids ON
    DEVICE with the same per-draw distribution as ``sampler``, so the whole
    batch selection runs inside the compiled train step (zero host bytes).

    * :class:`SimpleSampler` -> uniform-with-replacement over the buffer
      (both samplers in the reference are with-replacement across epochs;
      see reference sampler.py:33-38 for the importance variant).
    * :class:`ThetaImportanceSampler` -> image and column uniform; the row
      drawn by inverse-CDF over the cos-latitude weight table
      (reference: sampler.py:28-38).
    """
    import jax
    import jax.numpy as jnp

    if isinstance(sampler, ThetaImportanceSampler):
        cdf = jnp.asarray(np.cumsum(sampler.weight), jnp.float32)
        img_len, w, h = sampler.img_len, sampler.w, sampler.h

        def draw(key):
            k1, k2, k3 = jax.random.split(key, 3)
            img = jax.random.randint(k1, (batch_size,), 0, img_len)
            col = jax.random.randint(k2, (batch_size,), 0, w)
            u = jax.random.uniform(k3, (batch_size,))
            # first row with cdf >= u: P(row=i) = weight[i]
            row = jnp.minimum(
                jnp.searchsorted(cdf, u, side="left", method="compare_all"),
                h - 1)
            return img * (w * h) + row * w + col

        return draw

    def draw(key):
        return jax.random.randint(key, (batch_size,), 0, n_total)

    return draw
