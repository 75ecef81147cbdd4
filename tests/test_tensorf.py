"""TensoRF baseline family: shapes, gradients, alpha-mask machinery,
shrink/upsample surgery."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egonerf_tpu.coords.cartesian import CartesianCoords
from egonerf_tpu.models.egonerf import FieldConfig
from egonerf_tpu.models.tensorf import TensorCP, TensorVM, TensorVMSplit

AABB = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)


def make_model(cls=TensorVMSplit, **kw):
    coords = CartesianCoords(AABB)
    reso = [24, 24, 24]
    coords.set_resolution(reso)
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
                      shading_mode="MLP_Fea", view_pe=2, fea_pe=2, feature_c=32,
                      step_ratio=0.5, **kw)
    model = cls(AABB, reso, coords, cfg, near_far=(0.5, 3.5))
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-0.1, 0.1, size=(n, 3)).astype(np.float32)
    return jnp.asarray(np.concatenate([o, d], -1))


@pytest.mark.parametrize("cls", [TensorVMSplit, TensorVM, TensorCP])
def test_forward_and_grads(cls):
    model, params = make_model(cls)
    rays = random_rays(32)
    out = model.forward(params, rays, key=jax.random.PRNGKey(1), is_train=True,
                        n_coarse=32)
    assert out["rgb"].shape == (32, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    def loss(p):
        o = model.forward(p, rays, key=jax.random.PRNGKey(2), is_train=True, n_coarse=32)
        return jnp.mean(o["rgb"] ** 2)

    grads = jax.grad(loss)(params)
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_regularizers():
    model, params = make_model()
    for v in (model.density_l1(params), model.tv_loss_density(params),
              model.tv_loss_app(params), model.vector_comp_diffs(params)):
        assert np.isfinite(float(v))


def test_alpha_mask_cycle():
    model, params = make_model()
    new_aabb = model.update_alpha_mask(params, [16, 16, 16])
    assert model.alpha_mask is not None
    assert new_aabb.shape == (2, 3)
    # forward still runs with the mask installed
    rays = random_rays(16)
    out = model.forward(params, rays, n_coarse=16)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_ray_filtering_bbox():
    model, params = make_model()
    rng = np.random.default_rng(3)
    # half the rays start far outside and point away -> filtered out
    o_in = rng.uniform(-0.1, 0.1, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_out = (10.0 + rng.uniform(0, 1, (64, 3))).astype(np.float32)
    rays = np.concatenate([
        np.concatenate([o_in, d], -1),
        np.concatenate([o_out, d], -1),
    ]).astype(np.float32)
    rgbs = np.ones((128, 3), np.float32)
    kept_rays, kept_rgbs = model.filtering_rays(params, rays, rgbs, bbox_only=True)
    assert kept_rays.shape[0] < 128
    assert kept_rays.shape[0] >= 64  # all inside rays kept


def test_shrink_crops_grids():
    model, params = make_model()
    new_aabb = np.array([[-0.75, -0.75, -0.75], [0.75, 0.75, 0.75]], np.float32)
    params2, new_size = model.shrink(params, new_aabb)
    for p in params2["density_planes"]:
        assert p.shape[1] < 24 and p.shape[2] < 24
    assert all(s <= 24 for s in new_size)
    np.testing.assert_allclose(model.aabb, new_aabb)


def test_upsample_params():
    model, params = make_model()
    params2 = model.upsample_params(params, [32, 32, 32])
    assert params2["density_planes"][0].shape[1] == 32
    assert params2["density_lines"][0].shape[1] == 32


def test_cp_upsample_and_shrink():
    model, params = make_model(TensorCP)
    params2 = model.upsample_params(params, [32, 32, 32])
    assert params2["density_lines"][0].shape[1] == 32
    params3, new_size = model.shrink(params, np.array([[-0.75] * 3, [0.75] * 3], np.float32))
    assert params3["density_lines"][0].shape[1] <= 24


def test_ndc_path():
    model, params = make_model()
    rays = random_rays(16, seed=5)
    out = model.forward(params, rays, n_coarse=16, ndc_ray=True)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_packed_alpha_mask_matches_trilinear_golden():
    """The packed-row alpha-mask lookup (one fast-path int8 gather + fused
    multiply-reduce, models/alphamask.py) vs the 8-gather trilinear golden
    (ops/grid_sample.sample_volume), incl. out-of-range coords, both mask
    classes, and the checkpoint .volume round-trip."""
    import jax.numpy as jnp

    from egonerf_tpu.models.alphamask import AlphaGridMask, YinYangAlphaGridMask
    from egonerf_tpu.ops.grid_sample import sample_volume

    rng = np.random.default_rng(3)
    v1 = (rng.uniform(size=(9, 11, 13)) > 0.5).astype(np.float32)
    v2 = (rng.uniform(size=(9, 11, 13)) > 0.5).astype(np.float32)
    n = 6000
    coords = rng.uniform(-1.25, 1.25, size=(n, 3)).astype(np.float32)

    m = AlphaGridMask(v1)
    got = np.asarray(m.sample_alpha(jnp.asarray(coords)))
    want = np.asarray(sample_volume(
        jnp.asarray(v1.reshape(1, *v1.shape, 1)), jnp.asarray(coords[:, 0]),
        jnp.asarray(coords[:, 1]), jnp.asarray(coords[:, 2])))[:, 0]
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.array_equal(np.asarray(m.volume)[0, ..., 0], v1)

    ym = YinYangAlphaGridMask(v1, v2)
    c4 = np.concatenate([coords, rng.integers(0, 2, (n, 1))],
                        axis=1).astype(np.float32)
    got2 = np.asarray(ym.sample_alpha(jnp.asarray(c4)))
    want2 = np.asarray(sample_volume(
        ym.volume, jnp.asarray(c4[:, 0]), jnp.asarray(c4[:, 1]),
        jnp.asarray(c4[:, 2]), jnp.asarray(c4[:, 3].astype(np.int32))))[:, 0]
    np.testing.assert_allclose(got2, want2, atol=1e-6)


def test_hoist_dirs_forward_matches(monkeypatch):
    """TensoRF forward under the EGONERF_HOIST_DIRS gate (per-ray viewdir
    hoist in the MLP_Fea shader, see models/shading.py) matches the
    broadcast+concat default at f32 partial-sum tolerance; the density
    path is untouched so depth is bit-identical."""
    from egonerf_tpu.models import tensorf as tf_mod

    model, params = make_model()
    rays = random_rays(7, seed=5)
    base = model.forward(params, rays, n_coarse=24)
    monkeypatch.setattr(tf_mod, "_HOIST_DIRS", True)
    hoist = model.forward(params, rays, n_coarse=24)
    np.testing.assert_array_equal(np.asarray(hoist["depth"]),
                                  np.asarray(base["depth"]))
    np.testing.assert_allclose(np.asarray(hoist["rgb"]),
                               np.asarray(base["rgb"]), atol=2e-6)
