"""Eval-time empty-space culling for the merged sample set.

The reference gets eval speed from its alpha-mask culling (reference:
models/tensorBase.py:464-487) — data-dependent compaction that TPU static
shapes cannot express.  The TPU-native equivalent: the coarse density pass
(already computed for resampling) scores every merged sample, and a
fixed-K ``top_k`` keeps the K most important per ray — a *static*
compaction that shrinks every downstream fine-field lookup, combine and
shader evaluation by S/K while the dropped samples are exactly the ones
whose coarse neighbourhood carries no volume-rendering weight.

Occupancy-scored sample pruning is established NeRF practice (NerfAcc,
arXiv 2305.04966; Instant-NGP's occupancy grids); the novelty here is
only the static-shape TPU formulation.

Opt-in (``eval_keep`` render flag, default off = bit-identical renders);
an approximation by construction — dropped samples contribute their true
(near-zero) alpha to neither color nor transmittance.  Both helpers are
gather-free: per-(N,S)-row ``take_along_axis`` fetches are the
pathological sub-128-byte gather path (~12-20 ns/index, BASELINE.md cost
model), so bracketing is a broadcast-compare reduction and the compaction
fetch is one one-hot matmul.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def coarse_importance(z_vals: jnp.ndarray, coarse_z: jnp.ndarray,
                      coarse_weight: jnp.ndarray) -> jnp.ndarray:
    """Score merged samples by the (dilated) coarse weight at their depth.

    Args:
      z_vals:        (N, S) merged sample depths, sorted per ray.
      coarse_z:      (N, C) coarse sample depths, sorted per ray.
      coarse_weight: (N, C) volume-rendering weights of the coarse pass.
    Returns:
      (N, S) scores: max of the coarse interval weight containing each
      sample and its two neighbours (one-interval dilation keeps surface
      boundaries, mirroring the reference's alpha-mask max-pool dilation,
      reference: models/tensorBase.py:372).
    """
    w = coarse_weight
    w = jnp.maximum(w, jnp.maximum(
        jnp.concatenate([w[..., 1:], w[..., -1:]], axis=-1),
        jnp.concatenate([w[..., :1], w[..., :-1]], axis=-1)))
    lower = coarse_z
    upper = jnp.concatenate(
        [coarse_z[..., 1:], jnp.full_like(coarse_z[..., :1], jnp.inf)], axis=-1)
    # piecewise-constant lookup as one fused broadcast-compare reduction
    ind = ((z_vals[..., :, None] >= lower[..., None, :])
           & (z_vals[..., :, None] < upper[..., None, :]))  # (N, S, C)
    return jnp.sum(jnp.where(ind, w[..., None, :], 0.0), axis=-1)


def train_tiebreak(score: jnp.ndarray, key: jax.Array,
                   eps: float = 1e-4) -> jnp.ndarray:
    """Randomize the top-K tie-break among ~zero-score samples.

    ``lax.top_k`` resolves ties to the LOWEST index, so a noiseless
    train-time cull keeps the same near-camera empty samples every step
    and never re-exposes farther culled space to gradient — the
    occupancy-cull dead zone (NerfAcc counters it with periodic
    randomized occupancy refresh).  Scores below ``eps`` — the
    reference's ray-march weight threshold (rayMarch_weight_thres=1e-4,
    reference: models/tensorBase.py:136,482), i.e. exactly the samples
    the reference's ``app_mask`` would mask out — are replaced by pure
    per-step noise in [0, eps); scores >= ``eps`` are shifted by +``eps``
    (order-preserving, now all >= 2*eps).  Every interval the reference
    would shade therefore keeps STRICT priority over every interval it
    would mask, and the survivors among the masked rotate each step.
    """
    u = jax.random.uniform(key, score.shape, dtype=score.dtype)
    return jnp.where(score < eps, eps * u, score + eps)


def gumbel_perturb(score: jnp.ndarray, key: jax.Array, tau: float,
                   floor: float = 1e-6) -> jnp.ndarray:
    """Gumbel-top-K cull scores: stochastic keep ∝ score instead of a
    deterministic cutoff.

    Taking the K largest of ``log(score + floor) + tau*G`` (G standard
    Gumbel) draws K samples WITHOUT replacement with probability
    proportional to ``(score + floor)^(1/tau)`` (Kool et al.,
    arXiv 1903.06059).  This kills the deterministic top-K cull's failure
    mode (measured −3.2/−11.9 dB at keep 192/128, BASELINE.md cull
    table): mid-training coarse weights are diffuse (~1/S each, far above
    :func:`train_tiebreak`'s 1e-4 rotation threshold), so plain top-K
    permanently starves every sample below the cutoff of gradient while
    the shared VM factorization keeps drifting their densities.  Under
    Gumbel scores every sample keeps a nonzero per-step keep probability;
    once training concentrates weight on surfaces, the surface band is
    kept near-certainly and the spare slots rotate uniformly over the
    (equal-floor) empty samples — the exploration the tie-break provided,
    without the starved band.
    """
    u = jax.random.uniform(key, score.shape, dtype=score.dtype)
    g = -jnp.log(-jnp.log(u + 1e-12) + 1e-12)
    return jnp.log(score + floor) + tau * g


def select_top_k(z_vals: jnp.ndarray, dists: jnp.ndarray,
                 score: jnp.ndarray, k: int):
    """Keep the ``k`` highest-score samples per ray, depth order preserved.

    Each kept sample carries its ORIGINAL interval length (the gap to the
    next *merged* sample), so alpha compositing over the kept set treats
    dropped intervals as empty space rather than stretching neighbours.

    Returns (z_vals (N, k), dists (N, k)).
    """
    s = z_vals.shape[-1]
    if k >= s:
        return z_vals, dists
    _, idx = jax.lax.top_k(score, k)  # (N, k)
    idx = jnp.sort(idx, axis=-1)
    # one-hot rows are exact 1.0 and Precision.HIGHEST keeps the MXU from
    # truncating the f32 value operand to bf16 (the TPU default), so the
    # matmul extracts z/dist bit-exactly
    onehot = (idx[..., None] == jnp.arange(s, dtype=idx.dtype)).astype(z_vals.dtype)
    sel = jnp.einsum("nks,nsc->nkc", onehot,
                     jnp.stack([z_vals, dists], axis=-1),
                     precision=jax.lax.Precision.HIGHEST)
    return sel[..., 0], sel[..., 1]
