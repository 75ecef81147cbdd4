"""LPIPS perceptual metric in JAX (AlexNet and VGG16 backbones).

Replaces the reference's torch ``lpips`` package dependency
(reference: utils.py:77-104): the conv stack + LPIPS linear heads are
re-implemented as plain ``lax.conv_general_dilated`` calls over a weight
pytree loaded from a local ``.npz`` file, so evaluation computes
LPIPS-alex/vgg the day a weights file appears — no torch at eval time.

Weights discovery (first hit wins):
  1. ``$EGONERF_LPIPS_WEIGHTS_DIR/lpips_{net}.npz``
  2. ``~/.cache/egonerf_tpu/lpips_{net}.npz``
Export one with ``python -m egonerf_tpu.tools.export_lpips`` on any
machine that has the ``lpips`` package installed.

npz schema (all float32):
  ``conv{i}_w`` (H, W, Cin, Cout) and ``conv{i}_b`` (Cout,) for each
  backbone conv in order, and ``lin{j}_w`` (C_j,) — the non-negative
  1x1 LPIPS head weights, one per feature tap.

Graph parity with lpips v0.1 is pinned by ``tests/test_lpips.py``, which
rebuilds the same graph in torch from random weights and compares.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

# (net -> (conv specs, tap indices)): spec = (kernel, stride, pad, maxpool_before)
# AlexNet features (torchvision): conv k11s4p2, MaxPool(3,2), k5p2,
# MaxPool(3,2), 3x k3p1; pool kernel/stride = (3, 2)
_ALEX = dict(
    convs=[(11, 4, 2, False), (5, 1, 2, True), (3, 1, 1, True),
           (3, 1, 1, False), (3, 1, 1, False)],
    taps=[0, 1, 2, 3, 4],  # after every conv's ReLU
    pool=(3, 2),
)
# VGG16 features: 13 convs k3p1; MaxPool(2,2) before convs 2,4,7,10
_VGG = dict(
    convs=[(3, 1, 1, False), (3, 1, 1, False), (3, 1, 1, True),
           (3, 1, 1, False), (3, 1, 1, True), (3, 1, 1, False),
           (3, 1, 1, False), (3, 1, 1, True), (3, 1, 1, False),
           (3, 1, 1, False), (3, 1, 1, True), (3, 1, 1, False),
           (3, 1, 1, False)],
    taps=[1, 3, 6, 9, 12],  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
    pool=(2, 2),
)
_NETS = {"alex": _ALEX, "vgg": _VGG}

# lpips ScalingLayer constants (lpips/lpips.py v0.1)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def weights_path(net: str = "alex") -> str:
    base = os.environ.get("EGONERF_LPIPS_WEIGHTS_DIR",
                          os.path.expanduser("~/.cache/egonerf_tpu"))
    return os.path.join(base, f"lpips_{net}.npz")


def load_lpips_params(net: str = "alex") -> Optional[dict]:
    """Load the weight pytree from the documented path; None if absent."""
    path = weights_path(net)
    if not os.path.exists(path):
        return None
    data = np.load(path)
    n_convs = len(_NETS[net]["convs"])
    params = {
        "convs": [(jnp.asarray(data[f"conv{i}_w"]), jnp.asarray(data[f"conv{i}_b"]))
                  for i in range(n_convs)],
        "lins": [jnp.asarray(data[f"lin{j}_w"])
                 for j in range(len(_NETS[net]["taps"]))],
    }
    return params


def _max_pool(x, k: int, s: int):
    """MaxPool2d(kernel=k, stride=s) with torch's floor-mode sizing."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _backbone_feats(net: str, params, x):
    """x: (N, H, W, 3) scaled input -> list of tapped post-ReLU features."""
    specs = _NETS[net]["convs"]
    taps = set(_NETS[net]["taps"])
    pk, ps = _NETS[net]["pool"]
    feats = []
    for i, ((k, stride, pad, pool_before), (w, b)) in enumerate(
            zip(specs, params["convs"])):
        if pool_before:
            x = _max_pool(x, pk, ps)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.maximum(x + b, 0.0)
        if i in taps:
            feats.append(x)
    return feats


@partial(jax.jit, static_argnames=("net",))
def _lpips_pair(params, im0, im1, net: str = "alex"):
    """im0/im1: (H, W, 3) in [0, 1] -> scalar LPIPS distance."""
    x = jnp.stack([im0, im1])  # batch the two images through the backbone
    x = x * 2.0 - 1.0  # normalize=True (reference: utils.py:92)
    x = (x - _SHIFT) / _SCALE
    feats = _backbone_feats(net, params, x)
    total = 0.0
    for f, lin in zip(feats, params["lins"]):
        # lpips v0.1 normalize_tensor: x / (sqrt(sum x^2) + eps) — eps is
        # OUTSIDE the sqrt (for near-dead feature columns the two forms
        # differ by up to ~30%, so the placement matters for parity)
        f = f / (jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True)) + 1e-10)
        d = (f[0] - f[1]) ** 2
        # 1x1 non-negative head + spatial average (lpips spatial=False)
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return total


_PARAM_CACHE: dict = {}


def rgb_lpips_jax(np_gt: np.ndarray, np_im: np.ndarray,
                  net: str = "alex") -> Optional[float]:
    """LPIPS from the local weights file; None when no weights are found."""
    if net not in _PARAM_CACHE:
        params = load_lpips_params(net)
        if params is None:
            # don't cache the miss: a weights file exported later in the
            # same process (the "day a file appears" contract) must be
            # picked up on the next call
            return None
        _PARAM_CACHE[net] = params
    params = _PARAM_CACHE[net]
    return float(_lpips_pair(params, jnp.asarray(np_gt, jnp.float32),
                             jnp.asarray(np_im, jnp.float32), net=net))
