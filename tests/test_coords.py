"""Coordinate-system tests: charts checked against independent numpy
derivations of the published yin-yang construction."""
from math import pi

import numpy as np
import jax.numpy as jnp
import pytest

from egonerf_tpu.coords import coordinates_dict, coords_from_spec, make_coordinates
from egonerf_tpu.coords.yinyang import YinYangSphericalCoords

AABB = np.array([[-16.0, -16.0, -16.0], [16.0, 16.0, 16.0]], np.float32)


def _numpy_yinyang(xyz, center):
    """Independent re-derivation of the yin-yang chart from the paper."""
    d = xyz - center
    r = np.linalg.norm(d, axis=-1)
    with np.errstate(invalid="ignore"):
        theta_n = np.arccos(np.clip(np.where(r > 0, d[..., 2] / np.where(r == 0, 1, r), 0), -1, 1))
        theta_e = np.arccos(np.clip(np.where(r > 0, d[..., 1] / np.where(r == 0, 1, r), 0), -1, 1))
    phi_n = np.arctan2(d[..., 1], d[..., 0])
    phi_e = np.arctan2(d[..., 2], -d[..., 0])
    yin = (theta_n >= pi / 4) & (theta_n <= 3 * pi / 4) & (phi_n >= -3 * pi / 4) & (phi_n <= 3 * pi / 4)
    return r, np.where(yin, theta_n, theta_e), np.where(yin, phi_n, phi_e), (~yin).astype(np.float32)


def test_yinyang_chart_matches_independent_derivation():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-15, 15, size=(4096, 3)).astype(np.float32)
    cs = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=64**3, r0=0.05, interval_th=True)
    got = np.asarray(cs.from_cartesian(jnp.asarray(xyz)))
    r, theta, phi, flag = _numpy_yinyang(xyz, AABB.sum(0) / 2)
    np.testing.assert_allclose(got[:, 0], r, rtol=1e-4)
    np.testing.assert_allclose(got[:, 1], theta, atol=2e-4)
    np.testing.assert_allclose(got[:, 2], phi, atol=2e-4)
    np.testing.assert_array_equal(got[:, 3], flag)


def test_yinyang_angles_always_inside_grid_range():
    """Both charts keep their selected angles within the shared grid window:
    theta in [pi/4, 3pi/4], phi in [-3pi/4, 3pi/4] — the balanced-grid
    property that removes pole singularities."""
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(20000, 3)).astype(np.float32) * 5
    cs = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=64**3, r0=0.05, interval_th=True)
    got = np.asarray(cs.from_cartesian(jnp.asarray(xyz)))
    eps = 1e-4
    assert np.all(got[:, 1] >= pi / 4 - eps) and np.all(got[:, 1] <= 3 * pi / 4 + eps)
    assert np.all(got[:, 2] >= -3 * pi / 4 - eps) and np.all(got[:, 2] <= 3 * pi / 4 + eps)


def test_yinyang_normalize_in_range_and_monotone_r():
    cs = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=128**3, r0=0.05, interval_th=True)
    rng = np.random.default_rng(2)
    xyz = rng.uniform(-15, 15, size=(2048, 3)).astype(np.float32)
    coords = cs.from_cartesian(jnp.asarray(xyz))
    norm = np.asarray(cs.normalize_coord(coords))
    assert norm.shape == (2048, 4)
    assert np.all(norm[:, 1:3] >= -1 - 1e-5) and np.all(norm[:, 1:3] <= 1 + 1e-5)
    # r-normalization preserves ordering
    order = np.argsort(np.asarray(coords)[:, 0])
    assert np.all(np.diff(norm[order, 0]) >= -1e-6)


def test_yinyang_n_to_reso_default_budget():
    # 27e6**(1/3) is 299.999... in float, so N_r truncates to 149 before the
    # force-even step and N_theta is derived from the *pre-evened* N_r —
    # matching the reference's arithmetic order (models/coordinates.py:512-518)
    cs = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=27_000_000, r0=0.05, interval_th=True)
    assert cs.resolution == [150, 172, 516]


def test_registry_all_charts_construct_and_normalize():
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.uniform(-10, 10, size=(128, 3)).astype(np.float32))
    for name in coordinates_dict:
        cs = make_coordinates(name, AABB, exp_r=name in ("yinyang", "generic_sphere"),
                              N_voxel=64**3, r0=0.05, interval_th=False)
        if cs.resolution is None:
            reso = cs.N_to_reso(64**3)
            cs.set_resolution(reso)
        coords = cs.from_cartesian(xyz)
        norm = np.asarray(cs.normalize_coord(coords))
        assert norm.shape[0] == 128
        assert np.all(np.isfinite(norm)), name


def test_spec_roundtrip_yinyang():
    cs = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=96**3, r0=0.03, interval_th=True)
    cs2 = coords_from_spec(cs.to_spec())
    assert isinstance(cs2, YinYangSphericalCoords)
    assert cs2.resolution == cs.resolution
    xyz = jnp.asarray(np.random.default_rng(4).uniform(-12, 12, (64, 3)).astype(np.float32))
    a = np.asarray(cs.normalize_coord(cs.from_cartesian(xyz)))
    b = np.asarray(cs2.normalize_coord(cs2.from_cartesian(xyz)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_cartesian_round_trip():
    cs = make_coordinates("xyz", AABB)
    xyz = jnp.asarray([[0.0, 0.0, 0.0], [16.0, 16.0, 16.0], [-16.0, 0.0, 8.0]])
    norm = np.asarray(cs.normalize_coord(cs.from_cartesian(xyz)))
    np.testing.assert_allclose(norm[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(norm[1], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(norm[2], [-1, 0, 0.5], atol=1e-6)


def test_upsampling_positions_hit_grid_nodes():
    """r-aware resampling evaluates the OLD normalization at NEW grid nodes
    (reference: models/coordinates.py:238-250)."""
    cs = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=64**3, r0=0.05, interval_th=True)
    pos = cs.axis_positions(0, 48)
    assert pos.shape == (48,)
    assert np.all(np.diff(pos) > 0)
    assert pos[0] >= -1 - 1e-5
    # theta axis is plain linspace
    np.testing.assert_allclose(cs.axis_positions(1, 10), np.linspace(-1, 1, 10), atol=1e-6)


def test_up_sampling_vm_interpolates_constant_field():
    cs = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=64**3, r0=0.05, interval_th=True)
    plane = jnp.full((2, 12, 16, 4), 3.5, jnp.float32)
    out = np.asarray(cs.up_sampling_VM(plane, [24, 20, 32], ids=[1, 0]))
    assert out.shape == (2, 20, 24, 4)
    np.testing.assert_allclose(out, 3.5, atol=1e-5)
    line = jnp.full((2, 16, 4), -1.25, jnp.float32)
    out = np.asarray(cs.up_sampling_VM(line, [24, 20, 32], ids=[0]))
    assert out.shape == (2, 24, 4)
    np.testing.assert_allclose(out, -1.25, atol=1e-5)


def test_max_r_measured_from_chart_center_after_offcenter_shrink():
    """update_aabb/get_normalized_range measure max radius from the FIXED
    chart center, like the reference's _get_max_r (models/coordinates.py:
    187-204) — the new box's own half-diagonal would crop the radial grid
    short of real content once shrink hands in an off-center box."""
    from egonerf_tpu.coords.spherical import SphericalCoords

    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    c = SphericalCoords(aabb)
    assert c.far[0] == pytest.approx(np.sqrt(3.0), rel=1e-6)
    off = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], np.float32)
    # corner (1,1,1) is still sqrt(3) from the chart center (the origin);
    # the off-center box's own half-diagonal would claim sqrt(3)/2
    lo, hi = c.get_normalized_range(off)
    assert hi[0] == pytest.approx(1.0, rel=1e-6)
    c.update_aabb(off)
    assert c.far[0] == pytest.approx(np.sqrt(3.0), rel=1e-6)
