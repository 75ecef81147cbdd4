"""Shared experiment presets.

Every perf/quality tool (bench.py, tools/sampler_ab, tools/profile_step,
tools/envmap_e2e, tools/quality_run, __graft_entry__) drives the model at
the reference's HEADLINE production shape — N_voxel = 27e6
(300^3-equivalent yin-yang grid), n_lamb [16,16,16]/[48,48,48], MLP_Fea
with featureC=128, 128 coarse + 128 fine samples, batch 4096 (reference:
configs/EgoNeRF/common.txt:1-42 + omniblender/common_indoor.txt:5-9).
This module is the single source of that shape so the tools cannot
silently diverge from what bench.py measures; per-tool differences
(schedule, logging, near/far) are passed as explicit deltas.
"""
from __future__ import annotations


def production_overrides(**deltas) -> dict:
    """Config-override dict for the headline production shape.

    ``deltas`` are applied last and thus override any base entry —
    callers state their intentional deviations (iteration counts,
    logging cadence, near_far matched to their scene) explicitly.
    """
    base = dict(
        dataset_name="synthetic", model_name="EgoNeRF",
        coordinates_name="yinyang", exp_sampling=True, interval_th=True,
        r0="0.03", resampling=True, use_coarse_sample=True,
        n_coarse=128, n_fine=128, batch_size=4096,
        N_voxel_init=27_000_000, N_voxel_final=27_000_000,
        n_lamb_sigma="[16,16,16]", n_lamb_sh="[48,48,48]",
        data_dim_color=27, shadingMode="MLP_Fea", fea2denseAct="softplus",
        density_shift="-8", view_pe=2, fea_pe=2, featureC=128,
        lr_init=0.02, sparsity_lambda=0, near_far="[0.01, 15.0]",
        i_weights=10**9, seed=0,
        # train-time top-K cull (ops/cull.py).  0 = the reference's full
        # 256-evals/ray semantics.  Flipping this default is gated on the
        # pre-registered A/B protocol in NOTES.md ("Pending: train_keep
        # headline decision"); bench.py's headline follows this value.
        train_keep=0,
        # hybrid cull period: with train_keep on, every Mth step runs the
        # full reference forward (train/config.py).  Gated on the same
        # pre-registered A/B protocol as train_keep.
        train_keep_full_every=0,
        # Gumbel-top-K cull temperature (train/config.py); same gating.
        train_cull_tau=0.0,
    )
    base.update(deltas)
    return base
