"""Fused, packed VM-grid lookup — the TPU replacement for the reference's
24 ``F.grid_sample`` calls per step (reference: models/EgoNeRF.py:336-413).

TPU gather cost is dominated by a per-index overhead (~12-16 ns/row on
v5e via XLA's gather), with a fast path only for gathered rows of roughly
128-512 bytes.  Three structural transforms exploit that:

1. **Channel fusion** — density (16ch) and appearance (48ch) grids share
   every lookup coordinate, so they are concatenated into one 64-channel
   table: half the indices, and 64ch escapes the pathological <128-byte
   gather path that 16-channel rows hit.
2. **Corner packing** — the four bilinear corners of cell (y, x) are
   pre-packed into one row ``[P[y,x] | P[y,x+1] | P[y+1,x] | P[y+1,x+1]]``
   (edge-clamped shifts, rebuilt per step — a cheap dense op).  One gather
   then fetches the whole 2x2 patch: 4x fewer indices.
3. **bf16 rows** — 4*64 channels in bf16 is a 512-byte row, the top of the
   fast-gather window.  Parameters stay f32 masters; the cast is a fused
   elementwise op.

The custom VJP scatters corner-weighted cotangents into the packed layout
in <=512-byte f32 chunks (the fast scatter class) and reverses the packing
shifts densely.  The yin/yang stack axis is folded into the row index, so
a mixed batch is one static-shape gather (no boolean partitioning).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SCATTER_CHUNK = 128  # f32 columns per scatter op (512 B rows)

# Small tables (the VM *lines*: <=1040 stacked rows at the 300^3-equivalent
# production grid) escape the per-index gather/scatter cost entirely via a
# one-hot matmul on the MXU: rows_out = onehot(N, R) @ packed(R, 2C).  The
# one-hot is exactly representable in bf16, so the forward is BIT-IDENTICAL
# to the gather (the matmul copies one bf16 row per sample with f32
# accumulation), and the backward contracts cotangents with a single f32-
# accumulating matmul instead of 1M scattered adds.  Measured at production
# shape on v5e (tools/microbench_lookup.py, N=1.05M):
#   line bwd: 11.4-11.7 ms (f32 chunked scatter) -> 2.4-3.4 ms
#   line fwd:  4.2 ms (packed gather)            -> 2.7-3.6 ms
# The matmul cost scales with R; the gather is flat.  Crossover from the
# same measurements: fwd wins below ~1.2k rows, bwd below ~4k.  The env
# overrides exist for in-situ ablation (isolated-op wins can interact with
# scheduling/HBM pressure inside the full fused train step).
#
# In-situ ablation inside the full fused production train step
# (BENCH_QUICK=1 bench.py, v5e, 4.1k rays/step, step p50 ms / rays/s):
#   round-1 formulation          251.2 / 16,508
#   + onehot line fwd only       239.5 / 17,259
#   + onehot line bwd only       220.7 / 18,773
#   + sorted plane scatter only  327.2 / 12,619   <- REJECTED (see below)
# The two one-hot paths compose and are ON by default.  The sorted bf16
# plane scatter (argsort by destination + indices_are_sorted) wins in
# isolation (22.6 -> 16.4 ms/plane in the microbench) but REGRESSES the
# full step by +76 ms: the 3x 1.05M-element argsorts serialize against
# the step's other work and evict the packed tables from CMEM/VMEM,
# where the unsorted scatter overlaps.  Kept behind EGONERF_PLANE_SORTED=1
# for re-evaluation on future hardware; default OFF.
import os as _os

_ONEHOT_FWD_MAX_ROWS = int(_os.environ.get("EGONERF_ONEHOT_FWD_MAX_ROWS", 1152))
_ONEHOT_BWD_MAX_ROWS = int(_os.environ.get("EGONERF_ONEHOT_BWD_MAX_ROWS", 4096))
# the one-hot/hat matrix is (N, rows) bf16 and is materialized in HBM —
# cap its BYTES too, not just the row count: at the production N=1.05M the
# 1040-row tables cost ~2.2 GB (measured fine), but a 4096-row table still
# under the row cap would be 8.6 GB and OOM before the row gate trips
_ONEHOT_MAX_BYTES = float(_os.environ.get("EGONERF_ONEHOT_MAX_BYTES", 3e9))


def _onehot_ok(n_rows: int, n_idx: int, cap_rows: int) -> bool:
    return n_rows <= cap_rows and n_rows * n_idx * 2 <= _ONEHOT_MAX_BYTES
_PLANE_SORTED_SCATTER = _os.environ.get("EGONERF_PLANE_SORTED", "0") == "1"
# Corner-combine formulation: the reshape->einsum forces a 9.6 ms/step
# layout copy of the 512 MB gathered-row buffer (profile trace), but the
# "fix" — K static slice-multiply-adds on the native layout — re-reads
# that buffer K times and measured 182.5 ms/step vs einsum's 151.7
# (in-situ, BENCH_QUICK).  einsum+copy stays; toggle kept for re-checks.
_COMBINE_SLICED = _os.environ.get("EGONERF_COMBINE_SLICED", "0") == "1"
# Factorized two-stage combine: stage 1 folds the y-corner weights with a
# single LANE-ALIGNED 128-wide multiply-add over the (N, 4C) buffer, stage
# 2 folds the x weights on the 4x smaller (N, 2C) result — no reshape, so
# no layout copy.  REJECTED in-situ r3 (BENCH_QUICK, p50 ms / rays/s):
#   einsum+copy  151.2 / 27,552     factor  187.1 / 22,192
# Like the sliced and 3-D-gather variants before it, dodging the 9.6 ms
# copy costs more than the copy: the half-slice multiply-adds break the
# gather+convert fusion and re-traverse the row buffer.  Default OFF.
_COMBINE_FACTOR = _os.environ.get("EGONERF_COMBINE_FACTOR", "0") == "1"
# hat-matrix line lookup (sample_line_hat) under compute_dtype=bfloat16 —
# shared by EgoNeRF and the TensoRF family so a single toggle ablates the
# formulation everywhere (151.4 vs 157.6 ms/step in-situ; ON by default)
LINE_HAT = _os.environ.get("EGONERF_LINE_HAT", "1") == "1"
# (R, K, C)-shaped gather to skip the einsum layout copy: measured 195.6
# ms/step vs 151.7 — the 3-D operand falls off the 512-byte-row fast
# gather path entirely; copy + flat gather wins.  Kept for re-checks.
_GATHER_3D = _os.environ.get("EGONERF_GATHER_3D", "0") == "1"
# Matmul corner-combine: out = (rows * (w @ R)) @ S with constant 0/1
# block matrices R (K, K*C) and S (K*C, C) — the corner reduction rides
# the MXU and every intermediate keeps the gather's native (N, K*C)
# layout, so the (N, K, C) reshape and its 9.6 ms/step row-buffer layout
# copy disappear; the same identity forms backward corner cotangents as
# (w @ R) * (dout @ T) with T (C, K*C).  f32 multiply/accumulate — same
# summation count as the einsum (one product + K-term add per output).
# In-situ r3 (BENCH_QUICK, p50 ms / rays/s):
#   einsum+copy (0)        151.9 / 27,478    matmul (1)   145.9 / 28,554
#   bf16 product ("bf16")  145.0 / 28,710    + steps_per_call=24: both
#   variants land at 142.4 — the bf16 product's win vanishes once
#   dispatch is amortized, so the f32 product (exact weights, backward
#   bit-identical to the einsum formulation) is the default.
_COMBINE_MM = _os.environ.get("EGONERF_COMBINE_MM", "1") != "0"
# "bf16": keep the weighted rows in bf16 (no f32 convert traverse of the
# 512 MB row buffer; weights bf16-rounded like the hat path) and let the
# MXU accumulate in f32.  Kept for re-checks; no win over f32 (table
# above).
_COMBINE_MM_BF16 = _os.environ.get("EGONERF_COMBINE_MM", "1") == "bf16"
# pad the S matrix's output axis to the 128-lane MXU tile (c=64 leaves
# half the lanes idle); in-situ r3: 141.7 -> 140.8 ms/step.  Default ON.
_COMBINE_MM_PAD = _os.environ.get("EGONERF_COMBINE_MM_PAD", "1") == "1"
# the same 128-lane padding for the hat-matrix line dots (c = 16/48):
# measured NEUTRAL in-situ (140.8 ms both ways — the line dots are too
# small a bill for lane occupancy to matter).  Kept opt-in for re-checks.
_HAT_PAD = _os.environ.get("EGONERF_HAT_PAD", "0") == "1"
# Flat-row unpack of the scatter-VJP corner cotangents: the packed scatter
# result (R, 4C) must collapse its 4 shifted corner copies back into the
# (S, H, W, C) parameter gradient.  The original formulation reshaped to
# (S, H, W, 4, C) — a minor-axis layout transpose XLA lowers to an f32
# convert-copy + data movement of the whole 181 MB buffer — and routed the
# shifted adds through pad/dynamic-update-slice chains (~9.4 ms/step
# family total, profile r4).  In row-major (S, H*W, C) space a corner
# shift of (dy, dx) is a shift of dy*W+dx ROWS, so the unpack becomes
# static channel slices + row-shifted adds on the scatter's NATIVE layout;
# the chart/y/x edge clamps fold into constant 0/1 masks and same-row add
# terms.  f32 value flow and summation order are identical to the old
# expression (masks multiply by exact 0/1) — bit-exact, pinned by
# tests/test_ops.py.  "pad" selects the stencil sub-variant: one zero-pad
# of the packed buffer, every shifted term a static window of it (adds
# fuse with no per-term materialization; edge association reorders f32 by
# epsilon).  In-situ r4 (BENCH_QUICK, back to back, 2026-08-19):
#   flat (1)  137.3 ms / 29,924 rays/s     pad  134.0 ms / 30,646 rays/s
#   flat (1)  137.3 ms / 29,919 rays/s (repeat) -> pad is the default:
# the single fused stencil saves the per-term shifted-add materializations
# (-3.3 ms/step, vs_baseline 0.997 -> 1.022).
_UNPACK_MODE = _os.environ.get("EGONERF_UNPACK_FLAT", "pad")
_UNPACK_FLAT = _UNPACK_MODE != "0"
_UNPACK_PAD = _UNPACK_MODE == "pad"


def _onehot(idx: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    return (idx[:, None] == jnp.arange(n_rows, dtype=idx.dtype)[None, :]
            ).astype(jnp.bfloat16)


def _expand_weights_mm(weights, c: int, dtype):
    """(N, K) corner weights -> (N, K*C) with out[n, k*c+j] = w[n, k].

    Built as an MXU matmul against the constant block matrix
    R[k', k*c+j] = [k'==k] so the result is BORN in the row buffer's
    native (N, K*C) layout — a broadcast->reshape would re-trigger the
    layout copy this path exists to avoid."""
    k = weights.shape[-1]
    r = jnp.asarray(np.repeat(np.eye(k, dtype=np.float32), c, axis=1), dtype)
    return jax.lax.dot_general(weights.astype(dtype), r,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=dtype)


def _combine_mm(rows, weights, n_corners: int, out_dtype):
    """Sum the K weighted corner blocks of (N, K*C) ``rows`` on the MXU:
    (rows * (w @ R)) @ S, S[k*c+j', j] = [j'==j] — reshape-free."""
    c = rows.shape[-1] // n_corners
    mul_dtype = (jnp.bfloat16 if _COMBINE_MM_BF16
                 and rows.dtype == jnp.bfloat16 else out_dtype)
    w_big = _expand_weights_mm(weights, c, mul_dtype)
    prod = rows.astype(mul_dtype) * w_big
    s_np = np.tile(np.eye(c, dtype=np.float32), (n_corners, 1))
    if _COMBINE_MM_PAD and c % 128:
        # pad the selection matrix's output axis to the 128-lane MXU tile
        # (the zero columns are free compute; the result slice is a view)
        s_np = np.concatenate(
            [s_np, np.zeros((s_np.shape[0], -c % 128), np.float32)], axis=1)
    s_mat = jnp.asarray(s_np, mul_dtype)
    out = jax.lax.dot_general(prod, s_mat, (((1,), (0,)), ((), ())),
                              preferred_element_type=out_dtype)
    return out[:, :c] if out.shape[-1] != c else out


def _corner_cotangents(weights, dout, n_corners: int, c: int):
    """(N, K) weights x (N, C) dout -> (N, K*C) f32 corner cotangents,
    corner[n, k*c+j] = w[n, k] * dout[n, j] — the transpose-side twin of
    :func:`_combine_mm` (tile dout with T[j', k*c+j] = [j'==j] instead of
    broadcast->reshape, keeping the scatter operand's native layout)."""
    if _COMBINE_MM:
        w_big = _expand_weights_mm(weights, c, jnp.float32)
        t_mat = jnp.asarray(np.tile(np.eye(c, dtype=np.float32),
                                    (1, n_corners)), jnp.float32)
        d_big = jax.lax.dot_general(dout.astype(jnp.float32), t_mat,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        return w_big * d_big
    return (weights[:, :, None] * dout[:, None, :].astype(jnp.float32)
            ).reshape(weights.shape[0], n_corners * c)


def _shift_x(p):
    """p[..., y, x, c] -> p[..., y, min(x+1, W-1), c] (edge clamp)."""
    return jnp.concatenate([p[:, :, 1:], p[:, :, -1:]], axis=2)


def _shift_y(p):
    return jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)


def _shift_l(l):
    return jnp.concatenate([l[:, 1:], l[:, -1:]], axis=1)


def _unshift_x(g):
    """Adjoint of _shift_x: route cotangents back to their source column."""
    z = jnp.zeros_like(g)
    z = z.at[:, :, 1:].set(g[:, :, :-1])
    return z.at[:, :, -1].add(g[:, :, -1])


def _unshift_y(g):
    z = jnp.zeros_like(g)
    z = z.at[:, 1:].set(g[:, :-1])
    return z.at[:, -1].add(g[:, -1])


def _unshift_l(g):
    z = jnp.zeros_like(g)
    z = z.at[:, 1:].set(g[:, :-1])
    return z.at[:, -1].add(g[:, -1])


def _unpack_plane_grads(gpacked, s: int, h: int, w: int, c: int):
    """Collapse packed corner cotangents (S*H*W, 4C) -> (S, H, W, C).

    The adjoint of :func:`pack_plane`: corner k held the plane value at
    (y+dy_k, x+dx_k) (edge-clamped), so its cotangent routes BACK by the
    same shift.  See the ``_UNPACK_FLAT`` note at the top of this file for
    why this runs as row shifts on the scatter's native layout."""
    if not _UNPACK_FLAT:
        g = gpacked.astype(jnp.float32).reshape(s, h, w, 4, c)
        return (g[..., 0, :] + _unshift_x(g[..., 1, :])
                + _unshift_y(g[..., 2, :]) + _unshift_x(_unshift_y(g[..., 3, :])))
    if _UNPACK_PAD:
        # stencil form: ONE (w+1)-row zero-pad of the packed buffer, then
        # every shifted term is a static offset window of that single
        # buffer — adds fuse over aligned slices with no per-term
        # materialization.  Edge clamps stay as same-row mask terms.
        g = gpacked.reshape(s, h * w, 4 * c)
        gp = jnp.pad(g, ((0, 0), (w + 1, 0), (0, 0)))
        n = h * w
        xs = np.arange(n) % w
        ys = np.arange(n) // w
        not_x0 = jnp.asarray((xs != 0).astype(np.float32))[None, :, None]
        x_last = jnp.asarray((xs == w - 1).astype(np.float32))[None, :, None]
        y_last = jnp.asarray((ys == h - 1).astype(np.float32))[None, :, None]
        not_x0_ylast = not_x0 * y_last

        def win(off, k):  # rows shifted down by `off`, corner k, f32
            return jax.lax.dynamic_slice_in_dim(
                gp[..., k * c : (k + 1) * c], w + 1 - off, n, axis=1
            ).astype(jnp.float32)

        out = (win(0, 0)
               + win(1, 1) * not_x0 + win(0, 1) * x_last
               + win(w, 2) + win(0, 2) * y_last
               + win(w + 1, 3) * not_x0 + win(w, 3) * x_last
               + win(1, 3) * not_x0_ylast + win(0, 3) * (x_last * y_last))
        return out.reshape(s, h, w, c)
    g = gpacked.reshape(s, h * w, 4 * c)
    g0 = g[..., 0 * c : 1 * c].astype(jnp.float32)
    g1 = g[..., 1 * c : 2 * c].astype(jnp.float32)
    g2 = g[..., 2 * c : 3 * c].astype(jnp.float32)
    g3 = g[..., 3 * c : 4 * c].astype(jnp.float32)
    # row-position masks over the flattened (y, x) raster — constants, so
    # they fold into the fused elementwise adds
    xs = np.arange(h * w) % w
    ys = np.arange(h * w) // w
    not_x0 = jnp.asarray((xs != 0).astype(np.float32))[None, :, None]
    x_last = jnp.asarray((xs == w - 1).astype(np.float32))[None, :, None]
    y_last = jnp.asarray((ys == h - 1).astype(np.float32))[None, :, None]

    def ushx(v):  # adjoint of the x+1 edge-clamped shift, flat rows
        shifted = jnp.concatenate([jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1)
        return shifted * not_x0 + v * x_last

    def ushy(v):  # adjoint of the y+1 shift: first y-row zeros fall out of
        # the w-row concat; the clamp adds the last y-row back onto itself
        shifted = jnp.concatenate([jnp.zeros_like(v[:, :w]), v[:, :-w]], axis=1)
        return shifted + v * y_last

    out = g0 + ushx(g1) + ushy(g2) + ushx(ushy(g3))
    return out.reshape(s, h, w, c)


def pack_plane(plane: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(S, H, W, C) -> (S*H*W, 4C) corner-packed lookup table."""
    s, h, w, c = plane.shape
    px = _shift_x(plane)
    py = _shift_y(plane)
    pxy = _shift_x(py)
    packed = jnp.concatenate([plane, px, py, pxy], axis=-1)
    return packed.reshape(s * h * w, 4 * c).astype(dtype)


def pack_line(line: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(S, L, C) -> (S*L, 2C) pair-packed lookup table."""
    s, l, c = line.shape
    packed = jnp.concatenate([line, _shift_l(line)], axis=-1)
    return packed.reshape(s * l, 2 * c).astype(dtype)


def _axis_cells(coord, size):
    """[-1,1] coord -> (clamped cell0, weight0, weight1) with
    align_corners=True zeros-padding semantics.

    The weights are tied to the CLAMPED pair (cell0, cell0+1): for
    coords one cell below the grid (p in (-1, 0), cell0 floor = -1 but
    the fetch clamps to 0) the surviving corner is grid point 0, which
    sits at pair position 0 — its weight t lands on weight0, not
    weight1.  (This matches F.grid_sample's zeros padding; the unshifted
    formulation silently read grid point 1 there.)  In-range arithmetic
    is bit-identical to the plain (1-t, t) weights."""
    p = (coord + 1.0) * 0.5 * (size - 1)
    i0f = jnp.floor(p)
    t = p - i0f
    i0 = i0f.astype(jnp.int32)
    v0 = (i0 >= 0) & (i0 <= size - 1)
    v1 = (i0 + 1 >= 0) & (i0 + 1 <= size - 1)
    w0 = jnp.where(i0 == -1, t, (1.0 - t) * v0)
    w1 = t * (v1 & (i0 >= 0))
    return jnp.clip(i0, 0, size - 1), w0, w1


def plane_idx_weights_fac(x, y, sel, h: int, w: int):
    """Packed row index (N,) + per-axis weight pairs ((wy0, wy1),
    (wx0, wx1)), outer block axis first — the factorized form of the four
    corner products; validity/zeros-padding folded into the per-axis
    weights by :func:`_axis_cells`."""
    x0, wx0, wx1 = _axis_cells(x, w)
    y0, wy0, wy1 = _axis_cells(y, h)
    base = jnp.zeros_like(x0) if sel is None else sel.astype(jnp.int32) * (h * w)
    idx = base + y0 * w + x0
    return idx, ((wy0, wy1), (wx0, wx1))


def plane_idx_weights(x, y, sel, h: int, w: int):
    """Packed row index (N,) + 4 corner weights (N, 4) in order
    (y0x0, y0x1, y1x0, y1x1)."""
    idx, ((wy0, wy1), (wx0, wx1)) = plane_idx_weights_fac(x, y, sel, h, w)
    weights = jnp.stack(
        [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    return idx, weights


def line_idx_weights_fac(coord, sel, l: int):
    i0, w0, w1 = _axis_cells(coord, l)
    base = jnp.zeros_like(i0) if sel is None else sel.astype(jnp.int32) * l
    idx = base + i0
    return idx, ((w0, w1),)


def line_idx_weights(coord, sel, l: int):
    idx, ((w0, w1),) = line_idx_weights_fac(coord, sel, l)
    weights = jnp.stack([w0, w1], axis=-1)
    return idx, weights


def _gather_combine(packed, idx, weights, n_corners: int, out_dtype,
                    factors=None):
    n = idx.shape[0]
    n_rows = packed.shape[0]
    if (_onehot_ok(n_rows, n, _ONEHOT_FWD_MAX_ROWS)
            and packed.dtype == jnp.bfloat16 and out_dtype == jnp.float32):
        # small table: fetch rows with a one-hot matmul (bit-identical to
        # the gather — see the cost-model note at the top of this file)
        rows = jax.lax.dot_general(_onehot(idx, n_rows), packed,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    elif _GATHER_3D:
        # gather from the (R, K, C)-shaped view so the result is born in
        # the (n, K, C) layout the corner einsum wants — probing whether
        # XLA then skips the 9.6 ms/step row-buffer layout copy
        packed3 = packed.reshape(packed.shape[0], n_corners, -1)
        rows = jnp.take(packed3, idx, axis=0).astype(out_dtype)
        return jnp.einsum("nk,nkc->nc", weights.astype(out_dtype), rows)
    else:
        rows = jnp.take(packed, idx, axis=0).astype(out_dtype)
    if _COMBINE_FACTOR and factors is not None and not _COMBINE_SLICED:
        # factorized per-axis combine: each stage halves the buffer with a
        # multiply-add of two static half-slices (stage 1 is lane-aligned
        # 128-wide at production channel counts) — no (N, K, C) reshape,
        # so no layout copy of the row buffer
        out = rows if rows.dtype == out_dtype else rows.astype(out_dtype)
        for w0, w1 in factors:
            half = out.shape[-1] // 2
            out = (out[:, :half] * w0[:, None].astype(out_dtype)
                   + out[:, half:] * w1[:, None].astype(out_dtype))
        return out
    if _COMBINE_SLICED:
        # combine corners as K static slice-multiply-adds on the gather's
        # native (N, K*C) layout — the reshape->einsum formulation forces a
        # 9.6 ms/step layout copy of the 512 MB row buffer (profile trace)
        c = rows.shape[-1] // n_corners
        w = weights.astype(out_dtype)
        out = w[:, 0:1] * rows[:, :c]
        for k in range(1, n_corners):
            out = out + w[:, k : k + 1] * rows[:, k * c : (k + 1) * c]
        return out
    if _COMBINE_MM:
        return _combine_mm(rows, weights, n_corners, out_dtype)
    rows = rows.reshape(n, n_corners, -1)
    return jnp.einsum("nk,nkc->nc", weights.astype(out_dtype), rows)


def _scatter_chunked(idx, corner_grads, n_rows: int):
    """Scatter-add (N, K) f32 cotangents into (n_rows, K) in <=128-column
    chunks to stay on the fast scatter path."""
    n, k = corner_grads.shape
    outs = []
    for c0 in range(0, k, _SCATTER_CHUNK):
        chunk = corner_grads[:, c0 : c0 + _SCATTER_CHUNK]
        tab = jnp.zeros((n_rows, chunk.shape[1]), jnp.float32)
        outs.append(tab.at[idx].add(chunk))
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


# ---------------------------------------------------------------------------
# differentiable plane sample
# ---------------------------------------------------------------------------
@jax.custom_vjp
def sample_plane_packed(plane, x, y, sel):
    """Bilinear sample (S, H, W, C) planes at normalized (x, y) with stack
    selector ``sel``; returns (N, C) f32.  Equivalent to
    ``F.grid_sample(align_corners=True, padding_mode='zeros')`` per grid;
    the gather itself reads bf16 packed rows."""
    out, _ = _plane_fwd(plane, x, y, sel)
    return out


def _plane_fwd(plane, x, y, sel):
    s, h, w, c = plane.shape
    packed = pack_plane(plane)
    idx, fac = plane_idx_weights_fac(x, y, sel, h, w)
    ((wy0, wy1), (wx0, wx1)) = fac
    weights = jnp.stack(
        [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    out = _gather_combine(packed, idx, weights, 4, jnp.float32, factors=fac)
    return out, (idx, weights, plane.shape)


def _plane_bwd(res, dout):
    idx, weights, (s, h, w, c) = res
    corner = _corner_cotangents(weights, dout, 4, c)
    gpacked = _scatter_chunked(idx, corner, s * h * w)
    return _unpack_plane_grads(gpacked, s, h, w, c), None, None, None


sample_plane_packed.defvjp(_plane_fwd, _plane_bwd)


@jax.custom_vjp
def sample_plane_packed_fastgrad(plane, x, y, sel):
    """Same forward as :func:`sample_plane_packed`, but the backward
    scatters cotangents in ONE bf16 512-byte op per plane instead of two
    f32 chunks (~1.6x faster backward).  A sorted-destination variant
    (argsort + ``indices_are_sorted``, payload permute fused into the
    corner multiply) wins in the isolated microbench (22.6 -> 16.4
    ms/plane) but regresses the full fused step by +76 ms — see the
    ablation table at the top of this file; it stays opt-in via
    EGONERF_PLANE_SORTED=1.  bf16 scatter-add rounds each
    accumulation, so cells hit by very many samples (the near-field radial
    cells) lose gradient precision — opt-in via compute_dtype='bfloat16'."""
    out, _ = _plane_fwd(plane, x, y, sel)
    return out


def _plane_bwd_bf16(res, dout):
    idx, weights, (s, h, w, c) = res
    if not _PLANE_SORTED_SCATTER:
        corner = _corner_cotangents(weights, dout, 4, c).astype(jnp.bfloat16)
        gpacked = jnp.zeros((s * h * w, 4 * c), jnp.bfloat16).at[idx].add(corner)
        return _unpack_plane_grads(gpacked, s, h, w, c), None, None, None
    order = jnp.argsort(idx)
    corner = (weights[order][:, :, None]
              * dout[order][:, None, :].astype(jnp.float32)).reshape(
        idx.shape[0], 4 * c).astype(jnp.bfloat16)
    gpacked = jnp.zeros((s * h * w, 4 * c), jnp.bfloat16).at[
        jnp.take(idx, order)].add(corner, indices_are_sorted=True)
    return _unpack_plane_grads(gpacked, s, h, w, c), None, None, None


sample_plane_packed_fastgrad.defvjp(_plane_fwd, _plane_bwd_bf16)


# ---------------------------------------------------------------------------
# differentiable line sample
# ---------------------------------------------------------------------------
@jax.custom_vjp
def sample_line_packed(line, coord, sel):
    """Linear sample (S, L, C) lines at normalized coord; returns (N, C) f32."""
    out, _ = _line_fwd(line, coord, sel)
    return out


def _line_fwd(line, coord, sel):
    s, l, c = line.shape
    packed = pack_line(line)
    idx, fac = line_idx_weights_fac(coord, sel, l)
    weights = jnp.stack([fac[0][0], fac[0][1]], axis=-1)
    out = _gather_combine(packed, idx, weights, 2, jnp.float32, factors=fac)
    return out, (idx, weights, line.shape)


def _line_bwd(res, dout):
    idx, weights, (s, l, c) = res
    corner = _corner_cotangents(weights, dout, 2, c)
    gpacked = _scatter_chunked(idx, corner, s * l)
    g = gpacked.reshape(s, l, 2, c)
    dline = g[:, :, 0, :] + _unshift_l(g[:, :, 1, :])
    return dline, None, None


sample_line_packed.defvjp(_line_fwd, _line_bwd)


@jax.custom_vjp
def sample_line_packed_fastgrad(line, coord, sel):
    """Same forward as :func:`sample_line_packed` (bit-identical — both
    read the same bf16 packed rows), but the backward contracts the bf16
    corner cotangents against the one-hot matrix on the MXU with f32
    accumulation: one rounding per cotangent element instead of one per
    scatter-add, and 11.7 -> 2.4 ms per line at production shape on v5e
    (tools/microbench_lookup.py).  Falls back to the f32 chunked scatter
    for tables too large for the matmul to win."""
    out, _ = _line_fwd(line, coord, sel)
    return out


def _line_bwd_onehot(res, dout):
    idx, weights, (s, l, c) = res
    if not _onehot_ok(s * l, idx.shape[0], _ONEHOT_BWD_MAX_ROWS):
        return _line_bwd(res, dout)
    corner = _corner_cotangents(weights, dout, 2, c).astype(jnp.bfloat16)
    if _HAT_PAD and (2 * c) % 128:
        corner = jnp.pad(corner, ((0, 0), (0, -(2 * c) % 128)))
    gpacked = jax.lax.dot_general(_onehot(idx, s * l), corner,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    g = gpacked[:, :2 * c].reshape(s, l, 2, c)
    dline = g[:, :, 0, :] + _unshift_l(g[:, :, 1, :])
    return dline, None, None


sample_line_packed_fastgrad.defvjp(_line_fwd, _line_bwd_onehot)


def _hat_matrix(line_shape, coord, sel):
    """(N, S*L) bf16 hat matrix: tent-function interpolation weights over
    the stacked row axis, masked per chart.  ``hat @ table_flat`` IS the
    linear line sample: the tent at p reproduces _axis_cells' clamped
    weights exactly (including the zeros-padding cutoff for |coord| > 1),
    and the chart mask stops the tent of a boundary cell leaking into the
    other chart's adjacent stacked row."""
    s, l, c = line_shape
    p = (coord + 1.0) * 0.5 * (l - 1)
    js = jnp.arange(s * l, dtype=jnp.float32)
    if sel is None:  # single-chart table (the TensoRF family)
        tent = jnp.maximum(0.0, 1.0 - jnp.abs(p[:, None] - js[None, :]))
        return tent.astype(jnp.bfloat16)
    chart_ok = (js[None, :] // l).astype(jnp.int32) == sel[:, None]
    pos = p + sel.astype(p.dtype) * l
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - js[None, :]))
    return jnp.where(chart_ok, tent, 0.0).astype(jnp.bfloat16)


@jax.custom_vjp
def sample_line_hat(line, coord, sel):
    """Line sample as ONE hat-weight matmul on the MXU: the interpolation
    weights are folded into the (N, S*L) matrix itself, so forward skips
    the one-hot fetch + einsum (2.7 -> 1.5 ms per line at production
    shape, tools/microbench_lookup.py) and backward is the exact
    transpose ``hat^T @ dout``.  The hat entries are bf16-rounded —
    outputs differ from :func:`sample_line_packed` by ~one bf16 ulp of
    the weights — so this path is gated on ``compute_dtype=bfloat16``
    (quality A/B in BASELINE.md).  Falls back to the packed formulations
    for tables beyond the matmul crossover (see _hat_fwd/_hat_bwd)."""
    out, _ = _hat_fwd(line, coord, sel)
    return out


def _hat_fwd(line, coord, sel):
    s, l, c = line.shape
    if not _onehot_ok(s * l, coord.shape[0], _ONEHOT_FWD_MAX_ROWS):
        out, _ = _line_fwd(line, coord, sel)
        return out, (coord, sel, line.shape)
    hat = _hat_matrix(line.shape, coord, sel)
    flat = line.reshape(s * l, c).astype(jnp.bfloat16)
    if _HAT_PAD and c % 128:
        # zero-pad the table's channel axis to the 128-lane MXU tile
        flat = jnp.pad(flat, ((0, 0), (0, -c % 128)))
    out = jax.lax.dot_general(hat, flat, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out[:, :c], (coord, sel, line.shape)


def _hat_bwd(res, dout):
    coord, sel, (s, l, c) = res
    # same gate as _hat_fwd so forward and backward stay transposes of the
    # SAME operator — with the old wider bwd cap, tables in the fallback
    # band got a gather forward (f32 weights) but a hat backward
    # (bf16-rounded weights)
    if not _onehot_ok(s * l, coord.shape[0], _ONEHOT_FWD_MAX_ROWS):
        idx, weights = line_idx_weights(coord, sel, l)
        return _line_bwd((idx, weights, (s, l, c)), dout)
    hat = _hat_matrix((s, l, c), coord, sel)
    d = dout.astype(jnp.bfloat16)
    if _HAT_PAD and c % 128:
        d = jnp.pad(d, ((0, 0), (0, -c % 128)))
    dflat = jax.lax.dot_general(hat, d, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return dflat[:, :c].reshape(s, l, c), None, None


sample_line_hat.defvjp(_hat_fwd, _hat_bwd)


# ---------------------------------------------------------------------------
# gradient-free variants (coarse pdf grid — reference detaches it anyway,
# models/EgoNeRF.py:534)
# ---------------------------------------------------------------------------
def sample_plane_packed_nograd(packed, h, w, x, y, sel, n_channels,
                               compute_dtype=jnp.float32):
    idx, fac = plane_idx_weights_fac(x, y, sel, h, w)
    ((wy0, wy1), (wx0, wx1)) = fac
    weights = jnp.stack(
        [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    return _gather_combine(packed, idx, weights, 4, compute_dtype, factors=fac)


def sample_line_packed_nograd(packed, l, coord, sel, n_channels,
                              compute_dtype=jnp.float32):
    idx, fac = line_idx_weights_fac(coord, sel, l)
    weights = jnp.stack([fac[0][0], fac[0][1]], axis=-1)
    return _gather_combine(packed, idx, weights, 2, compute_dtype, factors=fac)
