"""Microbenchmark: VM-lookup formulations at production shape on the TPU.

Measures per-op time of the plane/line lookup forward + backward variants
at the reference headline shape (batch 4096 x 256 samples, N_voxel=27e6
yin-yang grid -> planes up to (2,520,174,64), lines up to (2,520,64)),
with ray-coherent indices (gather locality matters on TPU; uniform-random
indices undercount the fast path).

Run on the real chip:  python -m egonerf_tpu.tools.microbench_lookup

Evidence log for changes to ops/vm_lookup.py (see CLAUDE.md: change it
only with microbench evidence). Candidates measured here:

* one-hot matmul line lookup: the line tables are tiny (<=1040 stacked
  rows) so a (N, 2L) 0/1 matrix contracted on the MXU against the packed
  (2L, 2C) table replaces the per-index gather; bit-exact forward (the
  one-hot picks whole rows), and the backward's f32 MXU accumulation
  rounds strictly less than a bf16 scatter-add.
* sorted plane scatter with indices_are_sorted + the payload permute
  fused into the corner-weight multiply (VERDICT round-1 item 4).
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import vm_lookup as vl

B, S = 4096, 256
N = B * S
C = 64  # fused density(16)+app(48) channels

PLANE_SHAPES = [(2, 174, 150, C), (2, 520, 150, C), (2, 520, 174, C)]
LINE_SHAPES = [(2, 520, C), (2, 174, C), (2, 150, C)]

REPS = 24  # scan-fused iterations per timed call
CALLS = 3  # timed calls; min reported


def _sync(x):
    return float(jnp.sum(x))  # axon: block_until_ready does not block


def _time(fn, *args):
    out = fn(*args)  # compile + warm
    _sync(out)
    best = float("inf")
    for _ in range(CALLS):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best * 1e3  # ms per rep


def _scanned(body):
    """Scan `body(carry_perturbation)` REPS times so per-call dispatch
    (~17 ms through the tunnel) amortizes away; the carry perturbs the
    inputs each step so XLA cannot hoist the op out of the loop."""

    def outer(*args):
        def step(carry, _):
            out = body(carry, *args)
            return out * 1e-12, None

        final, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=REPS)
        return final

    return jax.jit(outer)


def ray_coherent_coords(seed: int = 0):
    """Realistic sample stream: exp-spaced depths along random rays through
    the yin-yang chart (locality matches training)."""
    from ..coords.yinyang import YinYangSphericalCoords

    aabb = np.array([[-8.5, -8.5, -8.5], [8.5, 8.5, 8.5]], np.float32)
    coords = YinYangSphericalCoords(aabb, exp_r=True, N_voxel=27_000_000,
                                    r0=0.05, interval_th=True)
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-0.2, 0.2, size=(B, 3)).astype(np.float32)
    t = np.geomspace(0.06, 8.4, S).astype(np.float32)[None, :, None]
    xyz = o[:, None, :] + d[:, None, :] * t
    norm = coords.normalize_coord(coords.from_cartesian(jnp.asarray(xyz)))
    flat = np.asarray(norm.reshape(-1, 4))
    return flat[:, 0], flat[:, 1], flat[:, 2], flat[:, 3].astype(np.int32)


def main():
    from . import require_tpu_relay

    require_tpu_relay()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', dev)}")
    rng = jax.random.PRNGKey(0)
    r, th, ph, sel = ray_coherent_coords()
    r, th, ph, sel = map(jnp.asarray, (r, th, ph, sel))
    dout = jax.random.normal(rng, (N, C), jnp.float32)

    results = {}

    # ---------------- lines ----------------
    for (s, l, c) in LINE_SHAPES:
        line = jax.random.normal(rng, (s, l, c), jnp.float32) * 0.1
        packed = vl.pack_line(line)  # (2L, 2C) bf16
        idx, w = vl.line_idx_weights(r, sel, l)

        def fwd_gather(p, line, coord):
            i, wt = vl.line_idx_weights(coord + p * 0.0, sel, l)
            return jnp.sum(vl._gather_combine(vl.pack_line(line), i, wt, 2,
                                              jnp.float32))

        results[f"line{l}_fwd_gather"] = _time(_scanned(fwd_gather), line, r)

        def bwd_scatter(p, idx, w, dout):
            corner = (w[:, :, None] * dout[:, None, :]).reshape(N, 2 * c)
            corner = corner + p
            g = vl._scatter_chunked(idx, corner, s * l)
            return jnp.sum(g)

        results[f"line{l}_bwd_scatter_f32"] = _time(
            _scanned(bwd_scatter), idx, w, dout)

        def bwd_scatter_bf16(p, idx, w, dout):
            corner = (w[:, :, None] * dout[:, None, :]).reshape(N, 2 * c)
            corner = (corner + p).astype(jnp.bfloat16)
            g = jnp.zeros((s * l, 2 * c), jnp.bfloat16).at[idx].add(corner)
            return jnp.sum(g.astype(jnp.float32))

        results[f"line{l}_bwd_scatter_bf16"] = _time(
            _scanned(bwd_scatter_bf16), idx, w, dout)

        def fwd_onehot(p, packed, idx, w):
            oh = (idx[:, None] == jnp.arange(s * l)[None, :]).astype(jnp.bfloat16)
            rows = jax.lax.dot_general(
                oh, packed + p.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rows = rows.reshape(N, 2, c)
            return jnp.sum(jnp.einsum("nk,nkc->nc", w, rows))

        results[f"line{l}_fwd_onehot_mm"] = _time(
            _scanned(fwd_onehot), packed, idx, w)

        def bwd_onehot(p, idx, w, dout):
            corner = (w[:, :, None] * dout[:, None, :]).reshape(N, 2 * c)
            corner = (corner + p).astype(jnp.bfloat16)
            oh = (idx[:, None] == jnp.arange(s * l)[None, :]).astype(jnp.bfloat16)
            g = jax.lax.dot_general(
                oh, corner, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.sum(g)

        results[f"line{l}_bwd_onehot_mm"] = _time(
            _scanned(bwd_onehot), idx, w, dout)

        # hat-weight variant: interpolation folded into the matrix, C-wide
        def fwd_hat(p, line, coordp):
            lf = line.reshape(s * l, c).astype(jnp.bfloat16)
            pos = (coordp + p * 0.0 + 1.0) * 0.5 * (l - 1) + sel * l
            hat = jnp.maximum(
                0.0, 1.0 - jnp.abs(pos[:, None] - jnp.arange(s * l)[None, :])
            ).astype(jnp.bfloat16)
            out = jax.lax.dot_general(hat, lf, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return jnp.sum(out)

        results[f"line{l}_fwd_hat_mm"] = _time(_scanned(fwd_hat), line, r)

    # ---------------- planes ----------------
    for (s, h, wd, c) in PLANE_SHAPES:
        plane = jax.random.normal(rng, (s, h, wd, c), jnp.float32) * 0.1
        idx, w4 = vl.plane_idx_weights(th, ph, sel, h, wd)

        def fwd_gather_p(p, plane, x):
            i, wt = vl.plane_idx_weights(x + p * 0.0, ph, sel, h, wd)
            return jnp.sum(vl._gather_combine(vl.pack_plane(plane), i, wt, 4,
                                              jnp.float32))

        results[f"plane{h}x{wd}_fwd_gather"] = _time(
            _scanned(fwd_gather_p), plane, th)

        def bwd_f32(p, idx, w4, dout):
            corner = (w4[:, :, None] * dout[:, None, :]).reshape(N, 4 * c) + p
            return jnp.sum(vl._scatter_chunked(idx, corner, s * h * wd))

        results[f"plane{h}x{wd}_bwd_scatter_f32"] = _time(
            _scanned(bwd_f32), idx, w4, dout)

        def bwd_bf16(p, idx, w4, dout):
            corner = ((w4[:, :, None] * dout[:, None, :]).reshape(N, 4 * c)
                      + p).astype(jnp.bfloat16)
            g = jnp.zeros((s * h * wd, 4 * c), jnp.bfloat16).at[idx].add(corner)
            return jnp.sum(g.astype(jnp.float32))

        results[f"plane{h}x{wd}_bwd_scatter_bf16"] = _time(
            _scanned(bwd_bf16), idx, w4, dout)

        def bwd_bf16_sorted(p, idx, w4, dout):
            order = jnp.argsort(idx)
            si = idx[order]
            # payload permute fused into the corner-weight multiply: gather
            # w4/dout rows through `order` and multiply in one fusion
            corner = ((w4[order][:, :, None] * dout[order][:, None, :])
                      .reshape(N, 4 * c) + p).astype(jnp.bfloat16)
            g = jnp.zeros((s * h * wd, 4 * c), jnp.bfloat16).at[si].add(
                corner, indices_are_sorted=True)
            return jnp.sum(g.astype(jnp.float32))

        results[f"plane{h}x{wd}_bwd_scatter_bf16_sorted"] = _time(
            _scanned(bwd_bf16_sorted), idx, w4, dout)

    # ---------------- z-merge sort ----------------
    zc = jnp.sort(jax.random.uniform(rng, (B, S // 2)), axis=-1)
    zf = jnp.sort(jax.random.uniform(rng, (B, S // 2)), axis=-1)

    def merge_sort(p, zc, zf):
        return jnp.sum(jnp.sort(jnp.concatenate([zc + p * 0.0, zf], -1), -1))

    results["zmerge_sort"] = _time(_scanned(merge_sort), zc, zf)

    def merge_ranks(p, zc, zf):
        # both halves already sorted: target position = own rank + rank in
        # the other half (compare_all, S/2 x S/2 per ray), placed with a
        # one-hot matmul instead of a scatter
        zcp = zc + p * 0.0
        rc = jnp.sum(zf[:, None, :] < zcp[:, :, None], -1) \
            + jnp.arange(S // 2)[None, :]
        rf = jnp.sum(zcp[:, None, :] <= zf[:, :, None], -1) \
            + jnp.arange(S // 2)[None, :]
        pos = jnp.concatenate([rc, rf], -1)  # (B, S) permutation
        oh = (pos[:, :, None] == jnp.arange(S)[None, None, :]).astype(jnp.bfloat16)
        z = jnp.concatenate([zcp, zf], -1)
        out = jnp.einsum("bso,bs->bo", oh, z)
        return jnp.sum(out)

    results["zmerge_ranks_mm"] = _time(_scanned(merge_ranks), zc, zf)

    print(f"\n{'op':44s} ms/rep")
    for k, v in results.items():
        print(f"{k:44s} {v:8.3f}")


if __name__ == "__main__":
    main()
