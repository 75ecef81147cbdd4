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
    (reference: sampler.py:19-38).

    ``img_wh_full`` is the FULL pre-roi-crop equirect size; the sampler
    derives the cropped per-image raster with the datasets' own slice
    arithmetic and the image count from the flat buffer length.  This is
    a deliberate deviation: the reference computes img_len outside from
    ``img_wh`` and re-applies the roi crop inside the sampler
    (reference: sampler.py:20-26, train.py:202-204), which double-crops
    on the datasets whose ``img_wh`` is already roi-cropped
    (dataset_omniscenes.py:14-16) — a latent misindexing its published
    configs never hit because they all use ``sampling_method = simple``."""

    def __init__(self, theta_importance_lambda: float, n_rays_total: int,
                 img_wh_full, batch: int, roi, seed: int = 0):
        self.batch = int(batch)
        w, h = img_wh_full
        # exact dataset slice arithmetic (datasets.py: int(r1*h)-int(r0*h)),
        # NOT int(h*(r1-r0)) — the two differ for some fractional rois
        self.w = int(roi[3] * w) - int(roi[2] * w)
        self.h = int(roi[1] * h) - int(roi[0] * h)
        if int(n_rays_total) % (self.w * self.h):
            raise ValueError(
                f"ray buffer length {n_rays_total} is not a multiple of the "
                f"per-image raster {self.w}x{self.h} — theta_importance "
                "requires the flat (img, row, col) layout (e.g. it cannot "
                "follow a filter_ray compaction)")
        self.img_len = int(n_rays_total) // (self.w * self.h)
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
