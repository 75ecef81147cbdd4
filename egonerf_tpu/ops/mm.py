"""Mixed-precision matmul: bf16 operands, f32 accumulation, both directions.

The MXU natively multiplies bf16 with an f32 accumulator; feeding it f32
operands costs ~4x the cycles.  ``mixed_matmul`` casts both operands to
bf16 for the forward AND both cotangent contractions of the backward (one
bf16 rounding per operand/cotangent element, every dot product still
accumulates in f32) — the standard mixed-precision recipe.  Plain
``a @ b`` on f32 inputs is what the reference's fp32 nn.Linear layers do
(reference: models/tensorBase.py:30-129).

STATUS: measured in-situ and REJECTED as a default — on the production
step the shader/basis matmuls are small enough that the bf16 casts break
XLA's elementwise fusions for a net −4 ms/step (ablation table in
models/egonerf.py) and cost gradient-direction parity.  Kept as an
opt-in ablation toggle (``EGONERF_MIXED_MM=1``, default off); worth
re-measuring if the MLP ever grows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _mm(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@jax.custom_vjp
def mixed_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., K) @ (K, N) -> (..., N) in f32, computed at bf16xbf16->f32."""
    return _mm(a, b)


def _fwd(a, b):
    return _mm(a, b), (a, b)


def _bwd(res, dout):
    a, b = res
    dout16 = dout.astype(jnp.bfloat16)
    # da = dout @ b^T ; db = a^T @ dout  (f32-accumulating MXU contractions)
    da = jax.lax.dot_general(
        dout16, b.astype(jnp.bfloat16),
        (((dout.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    a2 = a.reshape(-1, a.shape[-1]).astype(jnp.bfloat16)
    do2 = dout16.reshape(-1, dout.shape[-1])
    db = jax.lax.dot_general(
        a2, do2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return da.astype(a.dtype), db.astype(b.dtype)


mixed_matmul.defvjp(_fwd, _bwd)
