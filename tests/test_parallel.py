"""Multi-device correctness: the sharded train step must match the
single-device step numerically (same RNG, same batches — the mesh only
changes data placement)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from egonerf_tpu.coords.yinyang import YinYangSphericalCoords
from egonerf_tpu.models.egonerf import EgoNeRF, FieldConfig
from egonerf_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
)

AABB = np.array([[-4.0] * 3, [4.0] * 3], np.float32)


def setup():
    coords = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=24**3, r0=0.05,
                                    interval_th=True)
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
                      view_pe=2, fea_pe=2, feature_c=32)
    model = EgoNeRF(AABB, coords.resolution, coords, cfg, near_far=(0.05, 4.0))
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-0.2, 0.2, (64, 3)).astype(np.float32)
    rays = np.concatenate([o, d], -1).astype(np.float32)
    target = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    return model, params, rays, target


def make_step(model, tx):
    def step(params, opt_state, rays, target, key):
        def loss_fn(p):
            out = model.forward(p, rays, key=key, is_train=True, n_coarse=16, n_fine=16)
            return jnp.mean((out["rgb"] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def test_sharded_step_matches_single_device():
    assert jax.device_count() >= 8, "conftest should provide the virtual mesh"
    model, params, rays, target = setup()
    tx = optax.adam(1e-2)

    # single device
    step1 = jax.jit(make_step(model, tx))
    p1, s1 = params, tx.init(params)
    losses1 = []
    for i in range(3):
        p1, s1, l = step1(p1, s1, jnp.asarray(rays), jnp.asarray(target),
                          jax.random.PRNGKey(i))
        losses1.append(float(l))

    # 8-device mesh: batch sharded, params replicated
    mesh = make_mesh(8)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    step8 = jax.jit(make_step(model, tx),
                    in_shardings=(rep, rep, bs, bs, rep),
                    out_shardings=(rep, rep, rep))
    p8 = replicate_tree(mesh, params)
    s8 = replicate_tree(mesh, tx.init(params))
    losses8 = []
    for i in range(3):
        p8, s8, l = step8(p8, s8, jax.device_put(rays, bs),
                          jax.device_put(target, bs), jax.random.PRNGKey(i))
        losses8.append(float(l))

    np.testing.assert_allclose(losses1, losses8, rtol=2e-4)
    # params agree up to cross-shard reduction-order noise (the psum sums
    # gradient shards in a different order; Adam's rsqrt amplifies tiny
    # differences for near-zero second moments)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_eval_render_sharded_matches():
    model, params, rays, _ = setup()
    from egonerf_tpu.render.renderer import Renderer

    r_single = Renderer(model, chunk=32, n_coarse=16, n_fine=16)
    mesh = make_mesh(8)
    r_mesh = Renderer(model, chunk=32, mesh=mesh, n_coarse=16, n_fine=16)
    out1 = r_single.render_rays(params, rays)
    out8 = r_mesh.render_rays(params, rays)
    np.testing.assert_allclose(out1["rgb"], out8["rgb"], atol=1e-5)


def test_device_raygen_sharded_matches():
    """Device-side eval ray generation under a mesh (the pose+direction
    path evaluation() prefers) must equal the single-device render — the
    chunk axis is sharded over the mesh (renderer.set_directions)."""
    model, params, rays, _ = setup()
    from egonerf_tpu.render.renderer import Renderer

    dirs = rays[:, 3:6]
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = rays[0, :3]

    r_single = Renderer(model, chunk=32, n_coarse=16, n_fine=16)
    r_single.set_directions(dirs)
    out1 = r_single.render_view(params, c2w)

    mesh = make_mesh(8)
    r_mesh = Renderer(model, chunk=32, mesh=mesh, n_coarse=16, n_fine=16)
    r_mesh.set_directions(dirs)
    out8 = r_mesh.render_view(params, c2w)
    np.testing.assert_allclose(out1["rgb"], out8["rgb"], atol=1e-5)
    np.testing.assert_allclose(out1["depth"], out8["depth"], atol=1e-4)


def test_sharded_culled_step_matches_single_device():
    """The train_keep compacted step (top-K cull, ops/cull.py) under the
    8-way mesh must reproduce the single-device losses — the per-ray
    top_k/tie-break/select must be purely batch-local so sharding the ray
    axis changes nothing (guards a future train_keep default flip)."""
    model, params, rays, target = setup()
    tx = optax.adam(1e-2)

    def make_culled_step():
        def step(params, opt_state, rays, target, key):
            def loss_fn(p):
                out = model.forward(p, rays, key=key, is_train=True,
                                    n_coarse=16, n_fine=16, train_keep=24)
                return jnp.mean((out["rgb"] - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    step1 = jax.jit(make_culled_step())
    p1, s1 = params, tx.init(params)
    losses1 = []
    for i in range(3):
        p1, s1, l = step1(p1, s1, jnp.asarray(rays), jnp.asarray(target),
                          jax.random.PRNGKey(i))
        losses1.append(float(l))

    mesh = make_mesh(8)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    step8 = jax.jit(make_culled_step(),
                    in_shardings=(rep, rep, bs, bs, rep),
                    out_shardings=(rep, rep, rep))
    p8 = replicate_tree(mesh, params)
    s8 = replicate_tree(mesh, tx.init(params))
    losses8 = []
    for i in range(3):
        p8, s8, l = step8(p8, s8, jax.device_put(rays, bs),
                          jax.device_put(target, bs), jax.random.PRNGKey(i))
        losses8.append(float(l))

    np.testing.assert_allclose(losses1, losses8, rtol=2e-4)


def test_sharded_gumbel_hybrid_step_matches_single_device():
    """The Gumbel-keep step (train_cull_tau, ops/cull.py:gumbel_perturb)
    plus the hybrid lax.cond full-step branch must be shard-invariant:
    both the per-ray Gumbel draw and the cond predicate are functions of
    the replicated key/iteration only, so the 8-way ray sharding must
    reproduce single-device losses."""
    model, params, rays, target = setup()
    tx = optax.adam(1e-2)

    def make_step():
        def step(params, opt_state, rays, target, key, it):
            def loss_at(keep):
                def loss_fn(p):
                    out = model.forward(p, rays, key=key, is_train=True,
                                        n_coarse=16, n_fine=16,
                                        train_keep=keep, train_cull_tau=1.0)
                    return jnp.mean((out["rgb"] - target) ** 2)
                return loss_fn

            vg_culled = jax.value_and_grad(loss_at(24))
            vg_full = jax.value_and_grad(loss_at(0))
            loss, grads = jax.lax.cond(it % 2 == 0, vg_full, vg_culled, params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    step1 = jax.jit(make_step())
    p1, s1 = params, tx.init(params)
    losses1 = []
    for i in range(4):
        p1, s1, l = step1(p1, s1, jnp.asarray(rays), jnp.asarray(target),
                          jax.random.PRNGKey(i), jnp.int32(i))
        losses1.append(float(l))

    mesh = make_mesh(8)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    step8 = jax.jit(make_step(),
                    in_shardings=(rep, rep, bs, bs, rep, rep),
                    out_shardings=(rep, rep, rep))
    p8 = replicate_tree(mesh, params)
    s8 = replicate_tree(mesh, tx.init(params))
    losses8 = []
    for i in range(4):
        p8, s8, l = step8(p8, s8, jax.device_put(rays, bs),
                          jax.device_put(target, bs), jax.random.PRNGKey(i),
                          jnp.int32(i))
        losses8.append(float(l))

    np.testing.assert_allclose(losses1, losses8, rtol=2e-4)
