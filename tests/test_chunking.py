"""Fused-chunk scheduling: the scan chunker must never run a schedule
event in the middle of a fused multi-step dispatch."""
import numpy as np
import pytest

from egonerf_tpu.train.config import load_config
from egonerf_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chunk")
    cfg = load_config(overrides=dict(
        dataset_name="synthetic", model_name="EgoNeRF", coordinates_name="yinyang",
        exp_sampling=True, interval_th=True, r0="0.05", resampling=True,
        use_coarse_sample=True, n_coarse=8, n_fine=8, batch_size=128,
        n_iters=100, N_voxel_init=16**3, N_voxel_final=16**3,
        n_lamb_sigma="[4,4,4]", n_lamb_sh="[8,8,8]", data_dim_color=12,
        shadingMode="MLP_Fea", density_shift="-8", featureC=32, view_pe=2, fea_pe=2,
        near_far="[0.05, 8.5]", basedir=str(tmp), expname="chunk",
        N_vis=1, i_weights=20, vis_list="[31, 64]", upsamp_list="[45]",
        steps_per_call=8, eval_chunk=128, sparsity_lambda=0,
        iter_ignore_TV=50, TV_weight_density=0.1,
    ))
    return Trainer(cfg)


def _walk(trainer, start, end):
    """Simulate the chunk walk and return the list of (start, len) chunks."""
    chunks = []
    it = start
    while it < end:
        k = trainer._chunk_len(it)
        chunks.append((it, k))
        it += k
    return chunks


def test_chunks_partition_the_run(trainer):
    chunks = _walk(trainer, 0, 100)
    covered = []
    for s, k in chunks:
        assert 1 <= k <= 8
        covered.extend(range(s, s + k))
    assert covered == list(range(100))


def test_events_land_on_chunk_tails(trainer):
    """vis at 31/64 means event iteration 30/63; ckpt at 20/40/...;
    upsample at 45; TV phase flips at 50 — each must be a chunk's LAST
    iteration so post-step state changes apply before the next step."""
    chunks = _walk(trainer, 0, 100)
    tails = {s + k - 1 for s, k in chunks}
    for event_iter in (30, 63, 20, 40, 60, 80, 45, 49):
        assert event_iter in tails, f"event at {event_iter} mid-chunk"


def test_chunk_len_respects_remaining_iters(trainer):
    assert trainer._chunk_len(99) == 1
    assert trainer._chunk_len(97) <= 3
