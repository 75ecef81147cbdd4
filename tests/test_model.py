"""EgoNeRF model tests: shapes, gradients, and a tiny overfit run that
proves the full forward/backward path optimizes."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from egonerf_tpu.coords.yinyang import YinYangSphericalCoords
from egonerf_tpu.models.egonerf import EgoNeRF, FieldConfig

AABB = np.array([[-4.0, -4.0, -4.0], [4.0, 4.0, 4.0]], np.float32)


def make_model(use_envmap=False):
    coords = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=32**3, r0=0.05, interval_th=True)
    cfg = FieldConfig(
        density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
        view_pe=2, fea_pe=2, feature_c=32, use_envmap=use_envmap, envmap_res_h=16,
    )
    model = EgoNeRF(AABB, coords.resolution, coords, cfg, near_far=(0.05, 4.0))
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32)
    return jnp.asarray(np.concatenate([o, d], -1))


def test_forward_shapes_and_finiteness():
    model, params = make_model()
    rays = random_rays(64)
    out = model.forward(params, rays, key=jax.random.PRNGKey(1), is_train=True,
                        n_coarse=32, n_fine=32)
    assert out["rgb"].shape == (64, 3)
    assert out["depth"].shape == (64,)
    assert out["alpha"].shape == (64, 64)  # coarse+fine merged
    for k in ("rgb", "depth", "alpha"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert np.asarray(out["rgb"]).min() >= 0 and np.asarray(out["rgb"]).max() <= 1


def test_forward_eval_deterministic():
    model, params = make_model()
    rays = random_rays(32)
    a = model.forward(params, rays, key=None, is_train=False, n_coarse=32, n_fine=16)
    b = model.forward(params, rays, key=None, is_train=False, n_coarse=32, n_fine=16)
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))


def test_gradients_reach_all_parameters():
    model, params = make_model()
    rays = random_rays(64, seed=1)
    target = jnp.ones((64, 3)) * 0.5

    def loss_fn(p):
        out = model.forward(p, rays, key=jax.random.PRNGKey(2), is_train=True,
                            n_coarse=32, n_fine=32)
        return jnp.mean((out["rgb"] - target) ** 2)

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    for g in flat:
        assert np.isfinite(np.asarray(g)).all()
    # grid + basis + shader all receive nonzero gradient
    assert float(jnp.abs(grads["density_planes"][0]).sum()) > 0
    assert float(jnp.abs(grads["app_planes"][0]).sum()) > 0
    assert float(jnp.abs(grads["basis"]).sum()) > 0
    assert float(jnp.abs(grads["shader"]["l1"]["w"]).sum()) > 0


def test_envmap_paths():
    model, params = make_model(use_envmap=True)
    rays = random_rays(16)
    pre = model.forward(params, rays, pretrain_envmap=True)
    assert pre["env"].shape == (16, 3)
    out = model.forward(params, rays, key=None, is_train=False, n_coarse=16, n_fine=8)
    assert out["bg"].shape == (16, 3)
    assert out["alpha"].shape[-1] == 16 + 8 + 1  # +1 background slot


def test_regularizers_finite():
    model, params = make_model()
    for val in (model.density_l1(params), model.tv_loss_density(params),
                model.tv_loss_app(params), model.vector_comp_diffs(params)):
        assert np.isfinite(float(val))


def test_overfit_single_batch():
    """End-to-end optimization sanity: loss on a fixed batch must drop
    substantially in a couple hundred Adam steps (the SURVEY's stage-2
    gate).  The full-scene PSNR-climb test lives in test_e2e.py."""
    model, params = make_model()
    rays = random_rays(192, seed=3)
    # target colors: a smooth direction-dependent pattern
    d = np.asarray(rays[:, 3:6])
    target = jnp.asarray((d * 0.5 + 0.5).astype(np.float32))

    opt = optax.adam(2e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        def loss_fn(p):
            out = model.forward(p, rays, key=key, is_train=True, n_coarse=16, n_fine=16)
            return jnp.mean((out["rgb"] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    key = jax.random.PRNGKey(4)
    first = None
    for i in range(200):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert final < first / 4, f"loss {first} -> {final}"


def test_egonerf_rejects_non_yinyang_coords():
    from egonerf_tpu.coords.cartesian import CartesianCoords

    coords = CartesianCoords(AABB)
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12)
    with pytest.raises(TypeError):
        EgoNeRF(AABB, [16, 16, 16], coords, cfg)


def test_all_shading_modes():
    from egonerf_tpu.models.shading import make_shader

    # MLP_PE positionally encodes pts and expects 3-dim coords (the
    # reference has the same constraint, models/tensorBase.py:85)
    pts = jnp.zeros((10, 3))
    dirs = jnp.asarray(np.tile([0.0, 0.0, 1.0], (10, 1)).astype(np.float32))
    for mode, app_dim in (("MLP_Fea", 12), ("MLP_PE", 12), ("MLP", 12),
                          ("SH", 27), ("RGB", 3)):
        shader = make_shader(mode, app_dim, pos_pe=2, view_pe=2, fea_pe=2,
                             feature_c=16)
        params = shader.init(jax.random.PRNGKey(0)) if shader.init else None
        feats = jnp.asarray(np.random.default_rng(0).normal(
            size=(10, app_dim)).astype(np.float32))
        rgb = shader.apply(params, pts, dirs, feats)
        assert rgb.shape == (10, 3), mode
        assert np.isfinite(np.asarray(rgb)).all(), mode


def test_hoist_dirs_matches_concat():
    """MLP_Fea with UNEXPANDED (R, 3) viewdirs (the _HOIST_DIRS per-ray
    hoist path, rank-gated inside apply) must match the broadcast+concat
    formulation — forward to f32 partial-sum tolerance, gradients likewise
    (the parameter layout is untouched: the hoist row-slices l1.w)."""
    import jax

    from egonerf_tpu.models.shading import make_shader

    rng = np.random.default_rng(7)
    r, s, app_dim = 33, 17, 27
    shader = make_shader("MLP_Fea", app_dim, view_pe=2, fea_pe=2,
                         feature_c=128)
    params = shader.init(jax.random.PRNGKey(3))
    feats = jnp.asarray(rng.normal(size=(r, s, app_dim)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_exp = jnp.broadcast_to(dirs[:, None, :], (r, s, 3))

    def loss(p, d):
        return jnp.sum(shader.apply(p, None, d, feats) ** 2)

    out_hoist = np.asarray(shader.apply(params, None, dirs, feats))
    out_cat = np.asarray(shader.apply(params, None, dirs_exp, feats))
    assert out_hoist.shape == (r, s, 3)
    np.testing.assert_allclose(out_hoist, out_cat, atol=1e-6)
    g_hoist = jax.grad(loss)(params, dirs)
    g_cat = jax.grad(loss)(params, dirs_exp)
    for key in ("l1", "l2", "l3"):
        for leaf in ("w", "b"):
            a = np.asarray(g_hoist[key][leaf])
            b = np.asarray(g_cat[key][leaf])
            np.testing.assert_allclose(
                a, b, atol=2e-4 * max(np.abs(b).max(), 1.0),
                err_msg=f"{key}.{leaf}")


def test_hoist_dirs_model_forward_matches(monkeypatch):
    """End-to-end EgoNeRF forward under the _HOIST_DIRS gate matches the
    default path at f32 partial-sum tolerance (rgb and all composited
    outputs; density path untouched so depth is bit-identical)."""
    import jax

    from egonerf_tpu.models import egonerf as eg

    model, params = make_model()
    rays = random_rays(9, seed=11)
    kwargs = dict(is_train=False, n_coarse=32, n_fine=16)

    base = model.forward(params, rays, **kwargs)
    monkeypatch.setattr(eg, "_HOIST_DIRS", True)
    hoist = model.forward(params, rays, **kwargs)
    np.testing.assert_array_equal(np.asarray(hoist["depth"]),
                                  np.asarray(base["depth"]))
    np.testing.assert_allclose(np.asarray(hoist["rgb"]),
                               np.asarray(base["rgb"]), atol=2e-6)


def test_split_l1_matches_concat_mlp():
    """MLP_Fea with the concat-free first layer (shading _SPLIT_L1) must
    match the concat formulation: forward to f32 partial-sum tolerance,
    gradients likewise (the parameter layout is identical)."""
    import jax

    from egonerf_tpu.models.shading import make_shader, _SPLIT_L1

    rng = np.random.default_rng(5)
    n, app_dim = 257, 27
    shader = make_shader("MLP_Fea", app_dim, view_pe=2, fea_pe=2, feature_c=128)
    params = shader.init(jax.random.PRNGKey(0))
    feats = jnp.asarray(rng.normal(size=(n, app_dim)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    from egonerf_tpu.models import shading as sh_mod

    def run(split):
        old = sh_mod._SPLIT_L1
        sh_mod._SPLIT_L1 = split
        try:
            sh2 = make_shader("MLP_Fea", app_dim, view_pe=2, fea_pe=2,
                              feature_c=128)
            out = sh2.apply(params, None, dirs, feats)
            g = jax.grad(lambda p: jnp.sum(
                sh2.apply(p, None, dirs, feats) ** 2))(params)
            return np.asarray(out), g
        finally:
            sh_mod._SPLIT_L1 = old

    out_split, g_split = run(True)
    out_cat, g_cat = run(False)
    np.testing.assert_allclose(out_split, out_cat, atol=1e-6)
    for key in ("l1", "l2", "l3"):
        for leaf in ("w", "b"):
            a, b = np.asarray(g_split[key][leaf]), np.asarray(g_cat[key][leaf])
            np.testing.assert_allclose(a, b, atol=2e-4 * max(np.abs(b).max(), 1.0),
                                       err_msg=f"{key}.{leaf}")
