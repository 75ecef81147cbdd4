"""Eval-time empty-space cull (ops/cull.py, `eval_keep` render flag).

The static top-K compaction must (a) reduce exactly to the default path
when it keeps everything, (b) match a plain numpy selection, and (c) on a
converged field, render within a tight PSNR of the uncompacted image —
the reference's alpha-mask culling makes the same near-zero-contribution
bet (reference: models/tensorBase.py:464-487)."""
import numpy as np
import jax
import jax.numpy as jnp

from egonerf_tpu.coords.yinyang import YinYangSphericalCoords
from egonerf_tpu.models.egonerf import EgoNeRF, FieldConfig
from egonerf_tpu.ops.cull import coarse_importance, select_top_k

AABB = np.array([[-4.0, -4.0, -4.0], [4.0, 4.0, 4.0]], np.float32)


def make_model():
    coords = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=32**3, r0=0.05,
                                    interval_th=True)
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8),
                      app_dim=12, view_pe=2, fea_pe=2, feature_c=32)
    model = EgoNeRF(AABB, coords.resolution, coords, cfg, near_far=(0.05, 4.0))
    return model, model.init_params(jax.random.PRNGKey(0))


def random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32)
    return jnp.asarray(np.concatenate([o, d], -1))


def test_select_top_k_matches_numpy():
    rng = np.random.default_rng(1)
    n, s, k = 16, 24, 7
    z = np.sort(rng.uniform(0, 10, size=(n, s)).astype(np.float32), axis=-1)
    d = rng.uniform(0.01, 0.2, size=(n, s)).astype(np.float32)
    score = rng.uniform(size=(n, s)).astype(np.float32)
    zk, dk = select_top_k(jnp.asarray(z), jnp.asarray(d), jnp.asarray(score), k)
    for i in range(n):
        keep = np.sort(np.argsort(score[i])[::-1][:k])
        np.testing.assert_array_equal(np.asarray(zk)[i], z[i, keep])
        np.testing.assert_array_equal(np.asarray(dk)[i], d[i, keep])


def test_select_top_k_keep_all_is_identity():
    rng = np.random.default_rng(2)
    z = np.sort(rng.uniform(0, 10, size=(4, 12)).astype(np.float32), axis=-1)
    d = rng.uniform(0.01, 0.2, size=(4, 12)).astype(np.float32)
    score = rng.uniform(size=(4, 12)).astype(np.float32)
    for k in (12, 20):
        zk, dk = select_top_k(jnp.asarray(z), jnp.asarray(d), jnp.asarray(score), k)
        np.testing.assert_array_equal(np.asarray(zk), z)
        np.testing.assert_array_equal(np.asarray(dk), d)


def test_coarse_importance_is_dilated_interval_weight():
    coarse_z = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    w = jnp.asarray([[0.0, 5.0, 0.0, 0.0]])
    z = jnp.asarray([[1.1, 2.5, 3.5, 4.5]])
    score = np.asarray(coarse_importance(z, coarse_z, w))
    # one-interval dilation: [1,2) and [3,4) see the neighbouring 5.0;
    # beyond-the-last-edge samples fall in the clamped final interval
    np.testing.assert_allclose(score, [[5.0, 5.0, 5.0, 0.0]])


def test_eval_keep_near_exact_on_concentrated_field():
    """The cull's contract: when volume-rendering weight is concentrated
    (a converged opaque scene — the regime the reference's alpha-mask cull
    also bets on), dropping the scored-empty samples barely moves the
    render.  Build an everywhere-opaque field (weight all on the first
    sample or two of every ray) and check a 2x cull is near-exact."""
    model, params = make_model()
    params = dict(params)
    params["density_planes"] = [jnp.full_like(p, 1.3)
                                for p in params["density_planes"]]
    params["density_lines"] = [jnp.full_like(l, 1.3)
                               for l in params["density_lines"]]
    rays = random_rays(128, seed=3)

    full = model.forward(params, rays, key=None, is_train=False,
                         n_coarse=32, n_fine=32)
    half = model.forward(params, rays, key=None, is_train=False,
                         n_coarse=32, n_fine=32, eval_keep=32)
    assert half["rgb"].shape == full["rgb"].shape
    assert half["alpha"].shape[-1] == 32  # compacted sample axis
    # the opaque field concentrates ~all weight in the first samples,
    # which the coarse scoring must keep
    mse = float(jnp.mean((half["rgb"] - full["rgb"]) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    assert psnr > 45.0, f"cull-vs-full psnr {psnr:.2f}"
    assert float(jnp.max(jnp.abs(half["depth"] - full["depth"]))) < 0.05


def test_eval_keep_all_matches_default_path_exactly():
    model, params = make_model()
    rays = random_rays(64, seed=5)
    a = model.forward(params, rays, key=None, is_train=False, n_coarse=16, n_fine=16)
    b = model.forward(params, rays, key=None, is_train=False, n_coarse=16, n_fine=16,
                      eval_keep=32)  # == merged sample count -> identity
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))


def test_eval_keep_ignored_during_training():
    model, params = make_model()
    rays = random_rays(32, seed=6)
    a = model.forward(params, rays, key=jax.random.PRNGKey(7), is_train=True,
                      n_coarse=16, n_fine=16)
    b = model.forward(params, rays, key=jax.random.PRNGKey(7), is_train=True,
                      n_coarse=16, n_fine=16, eval_keep=8)
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))
    assert b["alpha"].shape[-1] == 32


def test_renderer_passes_eval_keep_through():
    from egonerf_tpu.render.renderer import Renderer

    model, params = make_model()
    renderer = Renderer(model, chunk=32, n_coarse=16, n_fine=16,
                        exp_sampling=True, resampling=True,
                        use_coarse_sample=True, eval_keep=16)
    out = renderer.render_rays(params, np.asarray(random_rays(70, seed=8)))
    assert out["rgb"].shape == (70, 3)
    assert np.isfinite(out["rgb"]).all()


def test_train_tiebreak_rotates_empties_keeps_surfaces():
    """The per-step tie-break (ops/cull.py:train_tiebreak) must (a) leave
    every above-threshold score's top-K membership untouched for any key,
    and (b) vary WHICH zero-score samples survive across steps — the
    anti-dead-zone property (a noiseless cull would keep the same
    lowest-index empties forever)."""
    from egonerf_tpu.ops.cull import train_tiebreak

    n, s, k = 64, 32, 8
    rng = np.random.default_rng(20)
    score = np.zeros((n, s), np.float32)
    surf = rng.integers(0, s, size=(n, 4))  # 4 "surface" samples per ray
    for i in range(n):
        score[i, surf[i]] = rng.uniform(0.01, 0.5, size=4)
    score = jnp.asarray(score)

    kept_sets = []
    for seed in range(6):
        noisy = train_tiebreak(score, jax.random.PRNGKey(seed))
        _, idx = jax.lax.top_k(noisy, k)
        idx = np.asarray(idx)
        # (a) every nonzero-score sample still selected
        for i in range(n):
            assert set(np.unique(surf[i])) <= set(idx[i])
        kept_sets.append(idx)
    # (b) the empty-sample complement rotates with the key
    assert any(not np.array_equal(kept_sets[0], kept_sets[j])
               for j in range(1, 6))
    # determinism: same key -> same selection
    again = train_tiebreak(score, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(jax.lax.top_k(again, k)[1]),
                                  kept_sets[0])


def test_train_tiebreak_strict_priority_at_threshold():
    """A score just ABOVE the 1e-4 ray-march threshold (reference would
    shade it) must beat any score below it (reference would mask it) for
    EVERY key — including sub-threshold scores close to the boundary.
    Naive additive noise in [0, eps) violates this (0.9e-4 + noise can
    exceed 1.5e-4 + noise); the where-form does not."""
    from egonerf_tpu.ops.cull import train_tiebreak

    score = jnp.asarray([[1.5e-4, 0.9e-4, 0.99e-4, 0.0, 1e-7, 1.0001e-4]],
                        jnp.float32)
    above = {0, 5}  # >= eps: shaded by the reference
    for seed in range(32):
        noisy = np.asarray(train_tiebreak(score, jax.random.PRNGKey(seed)))[0]
        assert min(noisy[i] for i in above) > max(
            noisy[j] for j in range(6) if j not in above)
    # ordering among the above-threshold scores is preserved
    assert noisy[0] > noisy[5]


def test_train_keep_all_matches_default_exactly():
    model, params = make_model()
    rays = random_rays(48, seed=9)
    key = jax.random.PRNGKey(10)
    a = model.forward(params, rays, key=key, is_train=True, n_coarse=16, n_fine=16)
    b = model.forward(params, rays, key=key, is_train=True, n_coarse=16, n_fine=16,
                      train_keep=32)
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))


def test_train_keep_gradients_flow_and_optimize():
    """With a 25% train-time cull the step must still reach every parameter
    group and drive the loss down (the selection indices are integer —
    gradients flow through the kept samples only)."""
    import optax

    model, params = make_model()
    rays = random_rays(128, seed=11)
    d = np.asarray(rays[:, 3:6])
    target = jnp.asarray((d * 0.5 + 0.5).astype(np.float32))

    def loss_fn(p, key):
        out = model.forward(p, rays, key=key, is_train=True,
                            n_coarse=32, n_fine=32, train_keep=48)
        assert out["alpha"].shape[-1] == 48
        return jnp.mean((out["rgb"] - target) ** 2)

    grads = jax.grad(loss_fn)(params, jax.random.PRNGKey(12))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(grads["density_planes"][0]).sum()) > 0
    assert float(jnp.abs(grads["app_planes"][0]).sum()) > 0
    assert float(jnp.abs(grads["shader"]["l1"]["w"]).sum()) > 0

    opt = optax.adam(2e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        loss, g = jax.value_and_grad(loss_fn)(p, key)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    key = jax.random.PRNGKey(13)
    first = None
    for _ in range(120):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < first / 3, f"loss {first} -> {float(loss)}"


def test_trainer_runs_with_train_keep(tmp_path):
    """The full Trainer drives a culled step end to end (config plumb)."""
    from egonerf_tpu.data.datasets import SyntheticEgoDataset
    from egonerf_tpu.train.config import load_config
    from egonerf_tpu.train.trainer import Trainer

    cfg = load_config(overrides=dict(
        expname="tk", basedir=str(tmp_path), model_name="EgoNeRF",
        coordinates_name="yinyang", exp_sampling=True, interval_th=True,
        r0=0.05, resampling=True, use_coarse_sample=True,
        dataset_name="synthetic", n_iters=12, batch_size=256,
        n_coarse=16, n_fine=16, N_voxel_init=27_000, N_voxel_final=27_000,
        n_lamb_sigma=[4, 4, 4], n_lamb_sh=[8, 8, 8],
        near_far=[0.05, 8.5], sparsity_lambda=0.0,
        N_vis=0, vis_list=[10**9], i_weights=10**9, steps_per_call=3,
        progress_refresh_rate=6, eval_chunk=2048, train_keep=24))
    trainer = Trainer(cfg)
    ds = dict(near_far=cfg.near_far, n_train=2, n_test=1, height=40, width=80)
    trainer.set_datasets(SyntheticEgoDataset(split="train", is_stack=False, **ds),
                         SyntheticEgoDataset(split="test", is_stack=True, **ds))
    trainer.train()  # must not raise; losses (incl. entropy on K) all run


def _mini_trainer(tmp_path, name, **toggles):
    from egonerf_tpu.data.datasets import SyntheticEgoDataset
    from egonerf_tpu.train.config import load_config
    from egonerf_tpu.train.trainer import Trainer

    cfg = load_config(overrides=dict(
        expname=name, basedir=str(tmp_path), model_name="EgoNeRF",
        coordinates_name="yinyang", exp_sampling=True, interval_th=True,
        r0=0.05, resampling=True, use_coarse_sample=True,
        dataset_name="synthetic", n_iters=12, batch_size=256,
        n_coarse=16, n_fine=16, N_voxel_init=27_000, N_voxel_final=27_000,
        n_lamb_sigma=[4, 4, 4], n_lamb_sh=[8, 8, 8],
        near_far=[0.05, 8.5], sparsity_lambda=0.0,
        N_vis=0, vis_list=[10**9], i_weights=10**9, steps_per_call=3,
        progress_refresh_rate=6, eval_chunk=2048, seed=7, **toggles))
    trainer = Trainer(cfg)
    ds = dict(near_far=cfg.near_far, n_train=2, n_test=1, height=40, width=80)
    trainer.set_datasets(SyntheticEgoDataset(split="train", is_stack=False, **ds),
                         SyntheticEgoDataset(split="test", is_stack=True, **ds))
    trainer.train()
    return trainer.params


def test_train_keep_full_every_one_is_the_uncull_path(tmp_path):
    """With full_every=1 every step takes the lax.cond full branch, so the
    hybrid trainer must reproduce the train_keep=0 trainer (same math,
    same RNG streams).  Tolerance, not bit-identity: XLA compiles the
    cond-wrapped branch with slightly different fusions than the inline
    step (measured: 2/1296 elements a final-ulp apart after 12 steps on
    the CPU mesh; bit-identical on TPU)."""
    p_hybrid = _mini_trainer(tmp_path, "fe1", train_keep=24,
                             train_keep_full_every=1)
    p_plain = _mini_trainer(tmp_path, "plain", train_keep=0)
    for a, b in zip(jax.tree_util.tree_leaves(p_hybrid),
                    jax.tree_util.tree_leaves(p_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-4)


def test_train_keep_full_every_period_mixes_both_branches(tmp_path):
    """full_every=3 trains end to end and differs from BOTH the pure-cull
    and the pure-full runs (each branch really executes on its steps)."""
    p_hybrid = _mini_trainer(tmp_path, "fe3", train_keep=24,
                             train_keep_full_every=3)
    p_cull = _mini_trainer(tmp_path, "cull", train_keep=24)
    p_full = _mini_trainer(tmp_path, "full", train_keep=0)
    for leaves in (jax.tree_util.tree_leaves(p_cull),
                   jax.tree_util.tree_leaves(p_full)):
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(p_hybrid), leaves))
    for g in jax.tree_util.tree_leaves(p_hybrid):
        assert np.isfinite(np.asarray(g)).all()


def test_gumbel_perturb_keeps_every_sample_sometimes():
    """Gumbel-top-K: the surface band is kept near-certainly, and even a
    zero-score sample is kept a nonzero fraction of steps (the property
    whose absence collapsed the deterministic cull, BASELINE.md table) —
    with equal scores filling the spare slots uniformly."""
    from egonerf_tpu.ops.cull import gumbel_perturb

    # 4 "surface" samples with weight ~0.25 each, 28 empties at exactly 0
    score = jnp.concatenate([jnp.full((1, 4), 0.25), jnp.zeros((1, 28))],
                            axis=-1)
    k = 12
    kept_counts = np.zeros(32)
    n_trials = 400
    for seed in range(n_trials):
        s = gumbel_perturb(score, jax.random.PRNGKey(seed), tau=1.0)
        idx = np.asarray(jax.lax.top_k(s, k)[1])[0]
        kept_counts[idx] += 1
    # surface samples essentially always kept
    assert (kept_counts[:4] > 0.99 * n_trials).all(), kept_counts[:4]
    # every empty sample rotates in (8 spare slots over 28 empties ≈ 29%)
    assert (kept_counts[4:] > 0.1 * n_trials).all(), kept_counts[4:].min()
    assert (kept_counts[4:] < 0.6 * n_trials).all(), kept_counts[4:].max()


def test_forward_with_gumbel_cull_runs_and_varies_kept_set():
    """train_cull_tau > 0 changes WHICH samples the cull keeps (vs the
    deterministic tie-break) but still returns K-shaped outputs with
    finite gradients."""
    model, params = make_model()
    rays = random_rays(64, seed=21)
    key = jax.random.PRNGKey(22)
    kw = dict(key=key, is_train=True, n_coarse=32, n_fine=32, train_keep=40)
    out_det = model.forward(params, rays, **kw)
    out_gum = model.forward(params, rays, train_cull_tau=1.0, **kw)
    assert out_gum["alpha"].shape[-1] == 40
    assert np.isfinite(np.asarray(out_gum["rgb"])).all()
    assert not np.allclose(np.asarray(out_det["depth"]),
                           np.asarray(out_gum["depth"]))

    def loss_fn(p):
        out = model.forward(p, rays, train_cull_tau=1.0, **kw)
        return jnp.mean(out["rgb"] ** 2)

    grads = jax.grad(loss_fn)(params)
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(grads["density_planes"][0]).sum()) > 0

def test_eval_keep_oracle_scorer_beats_or_matches_coarse():
    """The ORACLE scorer (full-resolution rendering weight,
    models/egonerf.py forward eval_keep_score='oracle') on the opaque
    field must reproduce the full render at least as well as the coarse
    scorer — it ranks by the exact weights the compositor will use."""
    model, params = make_model()
    params = dict(params)
    params["density_planes"] = [jnp.full_like(p, 1.3)
                                for p in params["density_planes"]]
    params["density_lines"] = [jnp.full_like(l, 1.3)
                               for l in params["density_lines"]]
    rays = random_rays(96, seed=11)
    full = model.forward(params, rays, key=None, is_train=False,
                         n_coarse=32, n_fine=32)

    def cull_psnr(score):
        out = model.forward(params, rays, key=None, is_train=False,
                            n_coarse=32, n_fine=32, eval_keep=32,
                            eval_keep_score=score)
        assert out["alpha"].shape[-1] == 32
        mse = float(jnp.mean((out["rgb"] - full["rgb"]) ** 2))
        return -10.0 * np.log10(mse + 1e-12)

    p_oracle, p_coarse = cull_psnr("oracle"), cull_psnr("coarse")
    assert p_oracle > 45.0, f"oracle cull psnr {p_oracle:.2f}"
    assert p_oracle >= p_coarse - 1.0, (p_oracle, p_coarse)
