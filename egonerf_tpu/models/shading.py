"""Shading modules: the per-sample appearance decoders.

Functional equivalents of the reference's render modules
(reference: models/tensorBase.py:30-129): parameters are plain pytrees,
``apply`` is a pure function, and the MLPs are large batched matmuls that
map straight onto the MXU.
"""
from __future__ import annotations

import os as _os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.pe import positional_encoding
from ..ops.sh import eval_sh_bases

# Bias-grad-as-dot toggle: XLA lowers the transpose of `x + b` to a
# column reduction over the (N, C) cotangent, which the production-step
# profile shows running ~4x off the read roofline (the `fusion ->
# (f32[128]` rows in tools/profile_step.py output).  With this toggle the
# bias add carries a custom VJP whose db is a ones-vector dot_general —
# the same sum, contracted on the MXU's f32 accumulator.  Forward is
# untouched (bit-identical); db reorders the f32 summation (epsilon).
# Measured in situ (BENCH_QUICK, v5e, r3): 140.6 ms/step vs 140.9 off —
# NEUTRAL; the bias-grad reductions are too small a bill for the 4x
# inefficiency to matter.  Kept opt-in for re-checks.
_BIAS_DOT = _os.environ.get("EGONERF_BIAS_DOT", "0") == "1"
# Concat-free first MLP layer: MLP_Fea's input is concat([features,
# viewdirs, pe(features), pe(viewdirs)]) — at the production shape a
# bf16[4096,256,150] concatenate (1.9 ms/step) plus layout copies feeding
# it and a matching backward split (profile r4, the 'shader MLP + PE'
# family).  Since concat(x_i) @ W == sum_i x_i @ W_i for row slices W_i of
# W, the first layer can consume each part directly and never materialize
# the concat; the parameter layout is unchanged (W is sliced at apply
# time), forward/backward reorder f32 summation only (one partial-sum per
# part instead of one fused dot) — parity pinned by
# tests/test_model.py::test_split_l1_matches_concat_mlp.  In-situ r4
# 4-way ablation (BENCH_QUICK, p50 ms): split alone 143.8 vs 140.6 off,
# and 140.3 vs 137.5 on top of the flat unpack — the four small matmuls
# LOSE to one fused 150-col dot (MXU pipelines one big contraction better
# than it overlaps four partial sums).  OFF by default; kept opt-in for
# re-checks.  Table: BASELINE.md round-4.
_SPLIT_L1 = _os.environ.get("EGONERF_SPLIT_L1", "0") == "1"
# Per-RAY hoist of the viewdir inputs: along one ray the view direction is
# constant across all S merged samples, yet the concat formulation pays
# pe(viewdirs) and the [dirs ⊕ pe(dirs)] rows of the first-layer matmul at
# R·S rows (1.05M at the production shape) — 256x redundant.  With the
# hoist, MLP_Fea receives UNEXPANDED (R, 3) viewdirs, computes the 15-col
# ray term as a (R, 15) @ (15, 128) matmul, and broadcast-adds it into the
# per-sample 135-col contraction: h = x_fea @ W_fea + (x_dir @ W_dir)[:,
# None, :].  Unlike the rejected 4-way _SPLIT_L1 this keeps ONE big
# per-sample contraction (135 of 150 cols) and moves the other matmul to
# 4096 rows (free); f32 summation reorders to two partial sums (epsilon;
# parity pinned by tests/test_model.py::test_hoist_dirs_matches_concat).
# OFF by default until the in-situ bench measures it (protocol:
# ops/vm_lookup.py §top).
_HOIST_DIRS = _os.environ.get("EGONERF_HOIST_DIRS", "0") == "1"


@jax.custom_vjp
def _bias_add(x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return x + b


def _bias_add_fwd(x, b):
    return x + b, None


def _bias_add_bwd(_, dout):
    do2 = dout.reshape(-1, dout.shape[-1])
    ones = jnp.ones((do2.shape[0],), do2.dtype)
    db = jax.lax.dot_general(ones, do2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dout, db.astype(dout.dtype)


_bias_add.defvjp(_bias_add_fwd, _bias_add_bwd)


def _add_bias(x, b):
    return _bias_add(x, b) if _BIAS_DOT else x + b


def _linear_init(key, n_in: int, n_out: int, with_bias=True, zero_bias=False):
    """torch.nn.Linear default init: U(-1/sqrt(n_in), 1/sqrt(n_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(n_in)))
    w = jax.random.uniform(kw, (n_in, n_out), minval=-bound, maxval=bound)
    if not with_bias:
        return {"w": w}
    b = (jnp.zeros((n_out,)) if zero_bias
         else jax.random.uniform(kb, (n_out,), minval=-bound, maxval=bound))
    return {"w": w, "b": b}


def _mlp3_apply(params, x, mm=None):
    mm = mm or (lambda a, b: a @ b)
    h = jnp.maximum(_add_bias(mm(x, params["l1"]["w"]), params["l1"]["b"]), 0.0)
    h = jnp.maximum(_add_bias(mm(h, params["l2"]["w"]), params["l2"]["b"]), 0.0)
    return _add_bias(mm(h, params["l3"]["w"]), params["l3"]["b"])


def _mlp3_apply_parts(params, parts, mm=None):
    """First layer as a sum of per-part matmuls against row slices of l1.w
    — the concat never materializes (see the ``_SPLIT_L1`` note)."""
    mm = mm or (lambda a, b: a @ b)
    w1 = params["l1"]["w"]
    h, off = None, 0
    for p in parts:
        d = p.shape[-1]
        term = mm(p, w1[off : off + d])
        h = term if h is None else h + term
        off += d
    h = jnp.maximum(_add_bias(h, params["l1"]["b"]), 0.0)
    h = jnp.maximum(_add_bias(mm(h, params["l2"]["w"]), params["l2"]["b"]), 0.0)
    return _add_bias(mm(h, params["l3"]["w"]), params["l3"]["b"])


def _mlp3_apply_hoist(params, features, viewdirs_ray, fea_pe, view_pe,
                      mm=None):
    """MLP_Fea first layer with the viewdir inputs hoisted to per-ray rows
    (see the ``_HOIST_DIRS`` note).  ``features`` is (..., S, D_f);
    ``viewdirs_ray`` is the UNEXPANDED (..., 3) per-ray direction.  l1.w's
    row layout is the concat order [features, dirs, pe(features),
    pe(dirs)], so the two sub-matrices are static row gathers of it —
    parameters are untouched."""
    mm = mm or (lambda a, b: a @ b)
    w1 = params["l1"]["w"]
    d_f = features.shape[-1]
    n_pef = 2 * fea_pe * d_f
    w_fea = jnp.concatenate([w1[:d_f], w1[d_f + 3 : d_f + 3 + n_pef]], axis=0)
    w_dir = jnp.concatenate([w1[d_f : d_f + 3], w1[d_f + 3 + n_pef :]], axis=0)
    x_fea = (jnp.concatenate([features, positional_encoding(features, fea_pe)],
                             axis=-1) if fea_pe > 0 else features)
    x_dir = (jnp.concatenate([viewdirs_ray,
                              positional_encoding(viewdirs_ray, view_pe)],
                             axis=-1) if view_pe > 0 else viewdirs_ray)
    h = mm(x_fea, w_fea) + mm(x_dir, w_dir)[..., None, :]
    h = jnp.maximum(_add_bias(h, params["l1"]["b"]), 0.0)
    h = jnp.maximum(_add_bias(mm(h, params["l2"]["w"]), params["l2"]["b"]), 0.0)
    return _add_bias(mm(h, params["l3"]["w"]), params["l3"]["b"])


def _mlp3_init(key, n_in, hidden):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "l1": _linear_init(k1, n_in, hidden),
        "l2": _linear_init(k2, hidden, hidden),
        "l3": _linear_init(k3, hidden, 3, zero_bias=True),
    }


class Shader(NamedTuple):
    """A shading module: ``init`` may be None for parameter-free shaders."""
    init: Optional[Callable]
    apply: Callable
    name: str


def make_shader(mode: str, app_dim: int, pos_pe: int = 6, view_pe: int = 6,
                fea_pe: int = 6, feature_c: int = 128,
                matmul=None) -> Shader:
    """Factory matching the reference registry
    (reference: models/tensorBase.py:188-204).  ``matmul`` optionally
    replaces the plain f32 ``@`` in the MLP layers (e.g.
    :func:`egonerf_tpu.ops.mm.mixed_matmul` for bf16-in/f32-accumulate
    on the MXU)."""
    if mode == "MLP_Fea":
        n_in = 2 * view_pe * 3 + 2 * fea_pe * app_dim + 3 + app_dim

        def init(key):
            return _mlp3_init(key, n_in, feature_c)

        def apply(params, pts, viewdirs, features):
            if viewdirs.ndim == features.ndim - 1:
                # unexpanded per-ray dirs: the call site opted into the
                # hoist (egonerf.py gates on _HOIST_DIRS + this mode)
                return jax.nn.sigmoid(_mlp3_apply_hoist(
                    params, features, viewdirs, fea_pe, view_pe, matmul))
            parts = [features, viewdirs]
            if fea_pe > 0:
                parts.append(positional_encoding(features, fea_pe))
            if view_pe > 0:
                parts.append(positional_encoding(viewdirs, view_pe))
            if _SPLIT_L1:
                return jax.nn.sigmoid(_mlp3_apply_parts(params, parts, matmul))
            return jax.nn.sigmoid(_mlp3_apply(params, jnp.concatenate(parts, axis=-1), matmul))

        return Shader(init, apply, mode)

    if mode == "MLP_PE":
        # the reference's layer width implies raw pts are an input, but its
        # forward never appends them — a latent shape mismatch in dead code
        # (reference: models/tensorBase.py:85 vs :95-101).  Implemented
        # self-consistently here: raw pts included.  pts must be 3-dim.
        n_in = (3 + 2 * view_pe * 3) + (3 + 2 * pos_pe * 3) + app_dim

        def init(key):
            return _mlp3_init(key, n_in, feature_c)

        def apply(params, pts, viewdirs, features):
            parts = [features, viewdirs, pts[..., :3]]
            if pos_pe > 0:
                parts.append(positional_encoding(pts[..., :3], pos_pe))
            if view_pe > 0:
                parts.append(positional_encoding(viewdirs, view_pe))
            return jax.nn.sigmoid(_mlp3_apply(params, jnp.concatenate(parts, axis=-1), matmul))

        return Shader(init, apply, mode)

    if mode == "MLP":
        n_in = (3 + 2 * view_pe * 3) + app_dim

        def init(key):
            return _mlp3_init(key, n_in, feature_c)

        def apply(params, pts, viewdirs, features):
            parts = [features, viewdirs]
            if view_pe > 0:
                parts.append(positional_encoding(viewdirs, view_pe))
            return jax.nn.sigmoid(_mlp3_apply(params, jnp.concatenate(parts, axis=-1), matmul))

        return Shader(init, apply, mode)

    if mode == "SH":
        def apply(params, pts, viewdirs, features):
            sh_mult = eval_sh_bases(2, viewdirs)[..., None, :]
            rgb_sh = features.reshape(*features.shape[:-1], 3, sh_mult.shape[-1])
            return jnp.maximum(jnp.sum(sh_mult * rgb_sh, axis=-1) + 0.5, 0.0)

        return Shader(None, apply, mode)

    if mode == "RGB":
        assert app_dim == 3, "RGB shader needs app_dim == 3"

        def apply(params, pts, viewdirs, features):
            return features

        return Shader(None, apply, mode)

    raise ValueError(f"Unrecognized shading mode: {mode}")
