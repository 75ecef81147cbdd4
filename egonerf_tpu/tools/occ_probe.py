"""Occupancy statistics of the merged eval sample set on a CONVERGED model.

The design question behind the exact eval-time empty-space skip (the
reference's own eval economy: a conservative alpha-mask gate,
reference models/tensorBase.py:464-469): with static TPU shapes the only
way a gate saves wall-clock is *compaction to a fixed budget B* with a
lax.cond fallback to the full path whenever any ray in a chunk has more
than B occupied samples — exact by construction.  Whether that wins is an
empirical property of the converged density field: the distribution of
K_i = #occupied merged samples on ray i, and especially the per-chunk
max(K_i) (one crowded ray forces its whole chunk onto the full path).

This probe loads a checkpoint, bakes the dilated occupancy volume exactly
like `EgoNeRF.update_alpha_mask` (threshold cfg.alpha_mask_thre), runs the
real sampling stages (exp coarse -> pdf resample -> bitonic merge) for
full test images, and reports the K histogram + per-chunk max stats +
the fraction of chunks eligible at candidate budgets.

Run on the TPU:
    python -m egonerf_tpu.tools.occ_probe [logdir] [budgets]
Defaults: logdir=/tmp/egonerf_quality/refscale100k, budgets=32,64,96,128,192.
Writes docs/results_occ_probe.json.
"""
from __future__ import annotations

import json
import os
import sys


def _run(logdir: str, budgets, n_train: int = 12, n_test: int = 2,
         height: int = 1000, width: int = 2000, chunk: int = 4096) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..data.datasets import SyntheticEgoDataset
    from ..train.checkpoint import load_checkpoint, unflatten_params
    from ..train.config import load_config
    from ..train.trainer import (build_model, coords_from_spec,
                                 latest_checkpoint)

    cfg = load_config(os.path.join(logdir, "args.txt"))
    ckpt_path = cfg.ckpt or latest_checkpoint(logdir)
    if not ckpt_path or not os.path.exists(ckpt_path):
        raise SystemExit(f"no checkpoint under {logdir}")
    test_ds = SyntheticEgoDataset(split="test", is_stack=True, n_train=n_train,
                                  n_test=n_test, height=height, width=width,
                                  near_far=cfg.near_far)
    # one full read of the multi-hundred-MB npz: header for the model
    # rebuild, then unflatten_params over the same flat dict
    flat, header, _ = load_checkpoint(ckpt_path)
    coords = coords_from_spec(header["coords_spec"])
    model = build_model(cfg, test_ds.scene_bbox, coords.resolution, coords,
                        test_ds.near_far, meta=header.get("model_meta"))
    params = unflatten_params(model.init_params(jax.random.PRNGKey(0)), flat)

    # bake the occupancy volume the way update_alpha_mask does (the mask
    # the exact skip would gate on), at the trainer's capped resolution
    reso_mask = [min(int(r), 128) for r in model.grid_size]
    model.update_alpha_mask(params, reso_mask)
    mask = model.alpha_mask

    n_coarse, n_fine = int(cfg.n_coarse), int(cfg.n_fine)

    def k_per_ray(p, rays):
        """Real sampling stages of EgoNeRF.forward (models/egonerf.py:376-460)
        at eval semantics (key=None -> deterministic draws, exactly what
        evaluation() renders) -> per-ray count of mask-occupied samples."""
        from ..models.egonerf import feature2density
        from ..ops.merge import merge_sorted
        from ..ops.pdf import sample_pdf
        from ..ops.volrend import raw2alpha

        rays_o, viewdirs = rays[:, :3], rays[:, 3:6]
        coarse_xyz, coarse_z = model.sample_ray_exp(rays_o, viewdirs,
                                                    None, n_coarse)
        coarse_dists = jnp.diff(coarse_z, axis=-1)
        coarse_dists = jnp.concatenate(
            [coarse_dists, coarse_dists[..., -1:]], axis=-1)
        coarse_coords = model.coordinates.from_cartesian(coarse_xyz)
        coarse_norm = model.coordinates.normalize_coord(coarse_coords,
                                                        downsample=2)
        c_planes, c_lines = model.derive_coarse(p)
        c_feat = model.compute_density_feature(c_planes, c_lines, coarse_norm)
        c_sigma = feature2density(c_feat, model.cfg)
        _, c_weight, _ = raw2alpha(c_sigma, coarse_dists * model.cfg.distance_scale)
        z_mid = 0.5 * (coarse_z[..., 1:] + coarse_z[..., :-1])
        fine_z = sample_pdf(z_mid, c_weight[..., 1:-1], n_fine, key=None,
                            sorted_draws=True)
        z_vals = merge_sorted(coarse_z, fine_z)
        xyz = rays_o[:, None, :] + viewdirs[:, None, :] * z_vals[..., None]
        norm = model.coordinates.normalize_coord(
            model.coordinates.from_cartesian(xyz))
        occ = mask.sample_alpha(norm) > 0.0
        return jnp.sum(occ.astype(jnp.int32), axis=-1)

    k_fn = jax.jit(k_per_ray)

    all_k = []
    for img in range(min(n_test, 2)):
        pose = np.asarray(test_ds.poses[img])
        dirs = np.asarray(test_ds.directions).reshape(-1, 3)
        rd = dirs @ pose[:3, :3].T
        ro = np.broadcast_to(pose[:3, 3], rd.shape)
        rays = np.concatenate([ro, rd], -1).astype(np.float32)
        n = rays.shape[0]
        for c0 in range(0, n, chunk):
            sl = rays[c0:c0 + chunk]
            valid = sl.shape[0]
            if valid < chunk:
                # pad the ray tail to the compiled chunk shape with copies
                # of the slice's own rays (statistics use only [:valid]) —
                # no ray is silently dropped, no extra compile shape
                reps = -(-chunk // valid)
                sl = np.concatenate([sl] * reps)[:chunk]
            k = np.asarray(k_fn(params, jnp.asarray(sl)))[:valid]
            all_k.append(k)
    ks = np.concatenate(all_k)
    chunk_max = np.asarray([k.max() for k in all_k])
    s = n_coarse + n_fine
    qs = [0, 25, 50, 75, 90, 99, 99.9, 100]
    rec = {
        "logdir": logdir, "ckpt": os.path.basename(ckpt_path),
        "mask_reso": reso_mask, "alpha_mask_thre": float(cfg.alpha_mask_thre),
        "n_samples_merged": s, "n_rays": int(ks.size),
        "n_chunks": int(chunk_max.size), "chunk": chunk,
        "occupied_sample_frac": round(float(ks.sum()) / (ks.size * s), 4),
        "k_percentiles": {str(q): int(np.percentile(ks, q)) for q in qs},
        "chunk_max_percentiles": {str(q): int(np.percentile(chunk_max, q))
                                  for q in qs},
        "chunk_eligible_frac": {
            str(b): round(float(np.mean(chunk_max <= b)), 4) for b in budgets},
        "ray_within_budget_frac": {
            str(b): round(float(np.mean(ks <= b)), 4) for b in budgets},
    }
    return rec


def main():
    from . import require_tpu_relay, write_results

    require_tpu_relay()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    logdir = args[0] if args else "/tmp/egonerf_quality/refscale100k"
    budgets = ([int(b) for b in args[1].split(",")] if len(args) > 1
               else [32, 64, 96, 128, 192])
    rec = _run(logdir, budgets)
    print(json.dumps(rec, indent=1), flush=True)
    write_results("occ_probe", rec)


if __name__ == "__main__":
    main()
