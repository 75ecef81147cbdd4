"""Gather-free merging of per-ray sorted depth arrays.

The reference merges coarse and fine depths with a full sort
(reference: models/EgoNeRF.py:536-539 ``torch.sort(torch.cat(...))``).
On TPU a full sort of (4096, 256) lowers to a ~36-stage sorting network;
but both inputs are already sorted per ray, so the union is obtainable
with Batcher's **bitonic merge**: ``[a ascending, b descending]`` is a
bitonic sequence, and log2(n) stages of static-shape min/max
compare-exchanges sort it — no gathers, no data-dependent control flow,
and every stage is a VPU-fused elementwise pass.

``sample_pdf`` draws are made sorted *by construction* with the
exponential-spacing order-statistics identity (u_(i) = S_i / S_{n+1},
S_i = sum of i iid Exp(1) draws): the joint law of the sorted vector
equals that of sorting n iid U(0,1) draws, so downstream semantics —
which only ever consume the sorted union — are distribution-identical
to the reference's unsorted ``torch.rand`` draws.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sorted_uniform(key, shape) -> jnp.ndarray:
    """Draw U(0,1) variates sorted ascending along the last axis.

    Uses the order-statistics construction (normalized cumulative sums of
    n+1 iid exponentials) instead of draw-then-sort: O(n) work, already
    sorted, and the joint distribution is exactly that of sorted iid
    uniforms.
    """
    n = shape[-1]
    e = jax.random.exponential(key, (*shape[:-1], n + 1), dtype=jnp.float32)
    c = jnp.cumsum(e, axis=-1)
    return c[..., :-1] / c[..., -1:]


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-row sorted arrays into one sorted array.

    Args:
      a: (..., n) sorted ascending along the last axis.
      b: (..., m) sorted ascending along the last axis.
    Returns:
      (..., n+m) ascending merge of the union — same values as
      ``jnp.sort(concatenate([a, b]))`` (bit-identical: ties are
      interchangeable equal values).

    Implementation: ``concat([a, reverse(b)])`` is bitonic, so a
    log2(n+m)-stage bitonic merge network sorts it.  Each stage is a
    static reshape + elementwise min/max — zero gathers.  Lengths that
    are not a power of two are padded with +inf on ``b``'s tail (the
    padded sequence stays bitonic) and sliced off afterwards.
    """
    n_out = a.shape[-1] + b.shape[-1]
    n = 1 << (n_out - 1).bit_length()  # next power of two
    pad = n - n_out
    if pad:
        b = jnp.concatenate(
            [b, jnp.full((*b.shape[:-1], pad), jnp.inf, b.dtype)], axis=-1)
    x = jnp.concatenate([a, b[..., ::-1]], axis=-1)
    lead = x.shape[:-1]
    d = n // 2
    while d >= 1:
        y = x.reshape(*lead, n // (2 * d), 2, d)
        lo = jnp.minimum(y[..., 0, :], y[..., 1, :])
        hi = jnp.maximum(y[..., 0, :], y[..., 1, :])
        x = jnp.stack([lo, hi], axis=-2).reshape(*lead, n)
        d //= 2
    return x[..., :n_out] if pad else x
