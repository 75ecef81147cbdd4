"""Exp-r grid math: golden/closed-form checks.

The reference only validated this by eyeballing printed grids
(reference: extra/test_exp_r.py:18-33); these are real invariant tests.
"""
import numpy as np
import jax.numpy as jnp

from egonerf_tpu.coords.expgrid import (
    apply_interval_th,
    exp_ratio,
    index2r,
    make_reference_r_grid,
    make_sample_r_grid,
    normalize_r_exp,
    normalize_r_lookup,
)


def test_index2r_convention():
    r0, ratio = 0.05, 1.1
    r = np.asarray(index2r(r0, ratio, np.arange(5)))
    assert r[0] == 0.0
    np.testing.assert_allclose(r[1], r0, rtol=1e-6)
    np.testing.assert_allclose(r[2], r0 * ratio, rtol=1e-6)
    np.testing.assert_allclose(r[4], r0 * ratio**3, rtol=1e-6)


def test_exp_ratio_endpoint():
    r0, far, n = 0.05, 15.0, 150
    ratio = exp_ratio(r0, far, n)
    np.testing.assert_allclose(r0 * ratio ** (n - 1), far, rtol=1e-5)


def test_apply_interval_th_prefix_and_continuity():
    r0, far, n = 0.001, 15.0, 150
    ratio = exp_ratio(r0, far, n)
    raw = np.asarray(index2r(r0, ratio, np.arange(n + 1)), dtype=np.float32)
    spliced = apply_interval_th(raw, r0)
    m = int(np.sum((raw[1:] - raw[:-1]) <= np.float32(r0)))
    # constant prefix
    np.testing.assert_allclose(spliced[: m + 1], np.arange(m + 1) * r0, atol=1e-7)
    # strictly monotonic everywhere
    assert np.all(np.diff(spliced) > 0)
    # tail intervals preserved exactly (pure shift)
    np.testing.assert_allclose(
        np.diff(spliced[m + 1 :]), np.diff(raw[m + 1 :]), rtol=1e-5
    )
    # tail intervals exceed r0
    assert np.all(np.diff(spliced)[m:] > r0 * 0.999)


def test_reference_grid_shape_and_anchor():
    r0, far, n = 0.03, 16.0, 150
    grid = make_reference_r_grid(r0, far, n)
    assert grid.shape == (n + 1,)
    assert grid[0] == 0.0
    np.testing.assert_allclose(grid[1], r0, rtol=1e-6)


def test_normalize_r_lookup_inverts_grid_nodes():
    grid = make_reference_r_grid(0.05, 10.0, 64)
    n_r = len(grid) - 1
    norm = np.asarray(normalize_r_lookup(jnp.asarray(grid), grid))
    np.testing.assert_allclose(norm, np.arange(n_r + 1) / n_r, atol=1e-5)
    # midpoints land halfway between cell indices
    mids = (grid[:-1] + grid[1:]) / 2
    norm_mid = np.asarray(normalize_r_lookup(jnp.asarray(mids), grid))
    np.testing.assert_allclose(norm_mid, (np.arange(n_r) + 0.5) / n_r, atol=1e-5)


def test_normalize_r_exp_closed_form():
    r0, far, n = 0.05, 12.0, 80
    ratio = exp_ratio(r0, far, n)
    ks = np.arange(0, n - 1)
    r = r0 * ratio**ks
    norm = np.asarray(normalize_r_exp(jnp.asarray(r, jnp.float32), r0, ratio, n))
    np.testing.assert_allclose(norm, (1.0 + ks) / n, atol=2e-4)
    # linear below r0
    r_small = np.asarray([0.0, r0 / 4, r0 / 2])
    norm_small = np.asarray(normalize_r_exp(jnp.asarray(r_small, jnp.float32), r0, ratio, n))
    np.testing.assert_allclose(norm_small, r_small / r0 / n, atol=1e-6)


def test_sample_grid_spans_near_far():
    r0, span, n = 0.03, 15.0, 128
    grid = make_sample_r_grid(r0, span, n)
    assert grid.shape == (n,)
    assert grid[0] == 0.0
    assert np.all(np.diff(grid) > 0)
    # reference quirk: last sample is span/ratio + splice shift, NOT span —
    # it lands near span but not exactly on it
    ratio = exp_ratio(r0, span, n)
    assert span / ratio * 0.99 < grid[-1] < span * 1.1
