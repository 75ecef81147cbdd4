"""Head-to-head convergence run: this framework vs the upstream PyTorch
EgoNeRF, same data / same initial weights / same ray-id sequence / same
optimizer schedule, PSNR-vs-iteration on held-out views.

Mirrors the reference training semantics (reference: train.py:244-385 with
all optional regularizers at their opt.py defaults of 0 -> MSE-only;
per-group Adam lrs from models/EgoNeRF.py:139-156; per-iter lr decay
train.py:328-329; envmap pretrain handoff train.py:218-242).  Both models
start from THIS framework's initial parameters (copied into the torch
model the same way the parity tests do) and consume the identical
SimpleSampler id stream, so any PSNR divergence isolates the numerics of
the two implementations rather than init/data luck.

Presets:
  small       2k iters at a 64k-voxel shape (the round-2 table)
  production  the full 27e6-voxel / batch-4096 / 128+128-sample headline
              shape for 300 iters (PSNR scored on a fixed ray subsample
              so the torch-CPU eval stays affordable)
  envmap      the 'env' background variant (texture at infinity): envmap
              pretrain -> optimizer reset -> joint training, exercising
              the reference's pretrain handoff end to end

Usage:  python -m egonerf_tpu.tools.headtohead_reference [preset] [out.json]
Requires the reference checkout at /root/reference (CPU torch).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REF = "/root/reference"

DECAY_RATIO = 0.1
EVAL_CHUNK = 4096
LR_GRID, LR_NET = 0.02, 1e-3
# reference: opt.py:66-67
LR_ENVMAP_PRETRAIN, LR_ENVMAP = 0.02, 0.005

PRESETS = {
    "small": dict(
        n_iters=2000, batch=1024, n_coarse=48, n_fine=48, n_voxel=64_000,
        eval_every=500, d_comp=(8, 8, 8), a_comp=(16, 16, 16), app_dim=12,
        feature_c=64, pretrain=0, eval_rays=None, dataset={}),
    "production": dict(
        n_iters=300, batch=4096, n_coarse=128, n_fine=128,
        n_voxel=27_000_000, eval_every=100, d_comp=(16, 16, 16),
        a_comp=(48, 48, 48), app_dim=27, feature_c=128, pretrain=0,
        eval_rays=32768, dataset={}),
    "envmap": dict(
        n_iters=1000, batch=1024, n_coarse=48, n_fine=48, n_voxel=64_000,
        eval_every=250, d_comp=(8, 8, 8), a_comp=(16, 16, 16), app_dim=12,
        feature_c=64, pretrain=200, envmap_res_h=100, eval_rays=None,
        dataset=dict(n_train=12, n_test=2, height=200, width=400,
                     background="env")),
}


def _stub_ref_deps():
    import types

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)

    stub("torchvision")
    stub("torchvision.transforms", ToTensor=lambda: None)
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    stub("kornia", create_meshgrid=lambda *a, **k: None)
    stub("cv2", COLORMAP_JET=2, applyColorMap=lambda *a, **k: None)
    stub("plyfile", PlyData=None, PlyElement=None)
    stub("skimage")
    stub("skimage.measure", marching_cubes=None)
    sys.modules["skimage"].measure = sys.modules["skimage.measure"]


def _copy_params_to_ref(ref, params, torch):
    """Stacked (2,H,W,C)/(2,L,C) pytree -> the reference's per-chart
    ParameterLists (same mapping as tests/test_reference_parity.py)."""

    def to_t(a):
        return torch.tensor(np.asarray(a))

    with torch.no_grad():
        for i in range(3):
            for name in ("density", "app"):
                plane = np.asarray(params[f"{name}_planes"][i])
                line = np.asarray(params[f"{name}_lines"][i])
                getattr(ref, f"{name}_plane_yin")[i].copy_(
                    to_t(plane[0].transpose(2, 0, 1)[None]))
                getattr(ref, f"{name}_plane_yang")[i].copy_(
                    to_t(plane[1].transpose(2, 0, 1)[None]))
                getattr(ref, f"{name}_line_yin")[i].copy_(
                    to_t(line[0].T[None, :, :, None]))
                getattr(ref, f"{name}_line_yang")[i].copy_(
                    to_t(line[1].T[None, :, :, None]))
        basis = np.asarray(params["basis"])
        ref.basis_mat_yin.weight.copy_(to_t(basis[0].T))
        ref.basis_mat_yang.weight.copy_(to_t(basis[1].T))
        sh = params["shader"]
        layers = [ref.renderModule.mlp[0], ref.renderModule.mlp[2],
                  ref.renderModule.mlp[4]]
        for layer, key in zip(layers, ("l1", "l2", "l3")):
            layer.weight.copy_(to_t(np.asarray(sh[key]["w"]).T))
            layer.bias.copy_(to_t(np.asarray(sh[key]["b"])))
        if "envmap" in params:
            # ours (2h, h, 3) channel-last == reference (3, 2h, h)
            ref.envmap.emission.copy_(
                to_t(np.asarray(params["envmap"]).transpose(2, 0, 1)))
        ref.update_coarse_sigma_grid()


def psnr(pred, gt):
    mse = float(np.mean((np.asarray(pred) - np.asarray(gt)) ** 2))
    return -10.0 * np.log(max(mse, 1e-12)) / np.log(10.0)


def main(preset: str = "small", out_path: str = ""):
    P = PRESETS[preset]
    out_path = out_path or f"/tmp/headtohead_{preset}.json"
    use_envmap = P["pretrain"] > 0

    import jax
    import jax.numpy as jnp
    import optax

    from ..coords.yinyang import YinYangSphericalCoords
    from ..data.datasets import SyntheticEgoDataset
    from ..data.samplers import SimpleSampler
    from ..models.egonerf import EgoNeRF, FieldConfig
    from ..train.optim import make_optimizer

    train_ds = SyntheticEgoDataset(split="train", is_stack=False,
                                   **P["dataset"])
    test_ds = SyntheticEgoDataset(split="test", is_stack=True, **P["dataset"])
    test_rays = np.asarray(test_ds.all_rays[0]).reshape(-1, 6).astype(np.float32)
    test_gt = np.asarray(test_ds.all_rgbs[0]).reshape(-1, 3).astype(np.float32)
    if P["eval_rays"] and P["eval_rays"] < test_rays.shape[0]:
        # fixed subsample keeps the torch-CPU eval affordable at the
        # production shape; identical rays on both sides -> fair PSNR
        pick = np.random.default_rng(7).choice(
            test_rays.shape[0], P["eval_rays"], replace=False)
        test_rays, test_gt = test_rays[pick], test_gt[pick]

    aabb = train_ds.scene_bbox
    near_far = list(train_ds.near_far)
    n_iters, batch = P["n_iters"], P["batch"]
    n_coarse, n_fine = P["n_coarse"], P["n_fine"]

    # ---- this framework --------------------------------------------------
    coords = YinYangSphericalCoords(aabb, exp_r=True, N_voxel=P["n_voxel"],
                                    r0=0.05, interval_th=True)
    cfg = FieldConfig(density_n_comp=P["d_comp"], app_n_comp=P["a_comp"],
                      app_dim=P["app_dim"], shading_mode="MLP_Fea", view_pe=2,
                      fea_pe=2, feature_c=P["feature_c"], density_shift=-8.0,
                      use_envmap=use_envmap,
                      envmap_res_h=P.get("envmap_res_h", 1000))
    ours = EgoNeRF(aabb, coords.resolution, coords, cfg, near_far=near_far)
    params = ours.init_params(jax.random.PRNGKey(0))
    params_init = jax.tree_util.tree_map(np.asarray, params)
    # constant lrs through pretrain — the reference's pretrain loop never
    # decays (train.py:222-233); decay starts with the main loop
    tx = make_optimizer(params, LR_GRID, LR_NET, LR_ENVMAP_PRETRAIN,
                        decay_target_ratio=1.0 if P["pretrain"] else DECAY_RATIO,
                        decay_iters=n_iters)
    opt_state = tx.init(params)

    # identical ray-id stream for both frameworks (pretrain consumes the
    # stream first, exactly like the reference loop train.py:222-229)
    sampler = SimpleSampler(train_ds.all_rays.shape[0], batch, seed=0)
    pre_ids = np.stack([sampler.nextids() for _ in range(P["pretrain"])]) \
        if P["pretrain"] else np.zeros((0, batch), np.int64)
    ids_all = np.stack([sampler.nextids() for _ in range(n_iters)])
    all_rays = np.asarray(train_ds.all_rays, np.float32)
    all_rgbs = np.asarray(train_ds.all_rgbs, np.float32)

    fwd_kw = dict(n_coarse=n_coarse, n_fine=n_fine, exp_sampling=True,
                  resampling=True, use_coarse_sample=True)

    def make_step(tx):
        @jax.jit
        def step(params, opt_state, rays, rgbs, key):
            def loss_fn(p):
                out = ours.forward(p, rays, key=key, is_train=True, **fwd_kw)
                return jnp.mean((out["rgb"] - rgbs) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return step

    step = make_step(tx)

    @jax.jit
    def pretrain_step(params, opt_state, rays, rgbs):
        def loss_fn(p):
            out = ours.forward(p, rays, key=None, is_train=True,
                               pretrain_envmap=True, **fwd_kw)
            return jnp.mean((out["env"] - rgbs) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def render_eval(params, rays):
        out = ours.forward(params, rays, key=None, is_train=False, **fwd_kw)
        return out["rgb"]

    def eval_ours(params):
        preds = []
        n = test_rays.shape[0]
        for c0 in range(0, n, EVAL_CHUNK):
            chunk = test_rays[c0:c0 + EVAL_CHUNK]
            pad = EVAL_CHUNK - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            preds.append(np.asarray(render_eval(params, jnp.asarray(chunk)))[
                :EVAL_CHUNK - pad if pad else EVAL_CHUNK])
        return psnr(np.concatenate(preds), test_gt)

    t0 = time.time()
    for it in range(P["pretrain"]):
        ids = pre_ids[it]
        params, opt_state, loss = pretrain_step(
            params, opt_state, jnp.asarray(all_rays[ids]),
            jnp.asarray(all_rgbs[ids]))
    if P["pretrain"]:
        # reference: train.py:241-242 — fresh Adam, envmap lr drops to
        # lr_envmap; decay schedule restarts with the main loop
        tx = make_optimizer(params, LR_GRID, LR_NET, LR_ENVMAP,
                            decay_target_ratio=DECAY_RATIO,
                            decay_iters=n_iters)
        opt_state = tx.init(params)
        step = make_step(tx)
        print(f"[ours ] envmap pretrain done ({time.time()-t0:.0f}s, "
              f"final mse {float(loss):.5f})", flush=True)

    ours_curve = {}
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    for it in range(n_iters):
        key, sub = jax.random.split(key)
        ids = ids_all[it]
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(all_rays[ids]),
            jnp.asarray(all_rgbs[ids]), sub)
        if (it + 1) % P["eval_every"] == 0:
            ours_curve[it + 1] = eval_ours(params)
            print(f"[ours ] iter {it+1}: test PSNR {ours_curve[it+1]:.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # ---- upstream torch reference ----------------------------------------
    _stub_ref_deps()
    import torch

    sys.path.insert(0, REF)
    from models.coordinates import YinYangSphericalCoords as RefCoords
    from models.EgoNeRF import EgoNeRF as RefEgoNeRF
    sys.path.pop(0)

    t_aabb = torch.tensor(np.asarray(aabb, np.float32))
    ref_coords = RefCoords("cpu", t_aabb, exp_r=True, N_voxel=P["n_voxel"],
                           r0=0.05, interval_th=True)
    ref = RefEgoNeRF(
        t_aabb, coords.resolution, "cpu", ref_coords,
        density_n_comp=list(P["d_comp"]), appearance_n_comp=list(P["a_comp"]),
        app_dim=P["app_dim"], near_far=near_far, shadingMode="MLP_Fea",
        density_shift=-8, distance_scale=25, pos_pe=6, view_pe=2, fea_pe=2,
        featureC=P["feature_c"], fea2denseAct="softplus",
        coarse_sigma_grid_update_rule="conv", use_envmap=use_envmap,
        envmap_res_H=P.get("envmap_res_h", 1000))
    _copy_params_to_ref(ref, params_init, torch)

    ref_kw = dict(is_train=True, ndc_ray=False, n_coarse=n_coarse,
                  n_fine=n_fine, exp_sampling=True, resampling=True,
                  use_coarse_sample=True, interval_th=True)

    opt = torch.optim.Adam(
        ref.get_optparam_groups(LR_GRID, LR_NET, LR_ENVMAP_PRETRAIN),
        betas=(0.9, 0.99))
    lr_factor = DECAY_RATIO ** (1.0 / n_iters)

    t0 = time.time()
    for it in range(P["pretrain"]):  # reference: train.py:222-233
        ids = pre_ids[it]
        env_map = ref(torch.tensor(all_rays[ids]), pretrain_envmap=True,
                      **ref_kw)
        loss = torch.mean((env_map - torch.tensor(all_rgbs[ids])) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
    if P["pretrain"]:  # reference: train.py:241-242
        opt = torch.optim.Adam(ref.get_optparam_groups(LR_GRID, LR_NET,
                                                       LR_ENVMAP),
                               betas=(0.9, 0.99))
        print(f"[torch] envmap pretrain done ({time.time()-t0:.0f}s, "
              f"final mse {loss.item():.5f})", flush=True)

    def eval_ref():
        preds = []
        with torch.no_grad():
            for c0 in range(0, test_rays.shape[0], EVAL_CHUNK):
                rgb, *_ = ref(torch.tensor(test_rays[c0:c0 + EVAL_CHUNK]),
                              **{**ref_kw, "is_train": False})
                preds.append(rgb.numpy())
        return psnr(np.concatenate(preds), test_gt)

    ref_curve = {}
    t0 = time.time()
    for it in range(n_iters):
        ids = ids_all[it]
        rgb, *_ = ref(torch.tensor(all_rays[ids]), **ref_kw)
        loss = torch.mean((rgb - torch.tensor(all_rgbs[ids])) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        for group in opt.param_groups:  # reference: train.py:328-329
            group["lr"] = group["lr"] * lr_factor
        ref.update_coarse_sigma_grid()
        if (it + 1) % P["eval_every"] == 0:
            ref_curve[it + 1] = eval_ref()
            print(f"[torch] iter {it+1}: test PSNR {ref_curve[it+1]:.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    table = {
        "preset": preset,
        "iters": sorted(ours_curve),
        "ours_psnr": [round(ours_curve[k], 3) for k in sorted(ours_curve)],
        "reference_psnr": [round(ref_curve[k], 3) for k in sorted(ref_curve)],
        "config": dict(n_iters=n_iters, batch=batch, n_coarse=n_coarse,
                       n_fine=n_fine, n_voxel=P["n_voxel"],
                       pretrain=P["pretrain"], eval_rays=P["eval_rays"]),
    }
    with open(out_path, "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table))


if __name__ == "__main__":
    from . import require_tpu_relay

    require_tpu_relay()
    main(*sys.argv[1:])
