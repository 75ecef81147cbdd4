"""Cooperative chip-yield mechanism (VERDICT r4 #1b).

Round-4 postmortem: a 4-hour quality run held the chip flock through the
driver's bench window and the official capture timed out empty.  The fix:
*preempting* lock waiters (the bench capture, acquire_tpu_lock(preempt=
True)) touch a yield file (tools.request_tpu_yield) and long-running
*holders* poll it at fused-chunk boundaries (Trainer.train), checkpoint,
and exit resumable; ordinary experiment drivers queue politely (a short
tool must not evict a 4-hour run).  These tests pin each link of that
chain on CPU; docs/results_yield_live.json is the hardware validation.
"""
import fcntl
import os

import pytest

from egonerf_tpu import tools
from egonerf_tpu.train.config import load_config
from egonerf_tpu.train.trainer import Trainer


def _small_cfg(tmp_path, **kw):
    base = dict(
        dataset_name="synthetic", model_name="EgoNeRF",
        coordinates_name="yinyang", exp_sampling=True, interval_th=True,
        r0="0.05", resampling=True, use_coarse_sample=True, n_coarse=12,
        n_fine=12, batch_size=256, n_iters=12, N_voxel_init=20**3,
        N_voxel_final=20**3, n_lamb_sigma="[4,4,4]", n_lamb_sh="[8,8,8]",
        data_dim_color=12, shadingMode="MLP_Fea", density_shift="-8",
        featureC=32, view_pe=2, fea_pe=2, near_far="[0.05, 8.5]",
        basedir=str(tmp_path), expname="yld", N_vis=0, i_weights=10**7,
        eval_chunk=256, sparsity_lambda=0, steps_per_call=4,
    )
    base.update(kw)
    return load_config(overrides=base)


def test_yield_request_freshness(tmp_path, monkeypatch):
    ypath = str(tmp_path / "yield")
    monkeypatch.setenv("TPU_YIELD_PATH", ypath)
    # no file -> no request
    assert not tools.tpu_yield_requested()
    tools.request_tpu_yield()
    assert os.path.exists(ypath)
    assert tools.tpu_yield_requested()
    # a stale request (e.g. from a killed waiter) must be ignored
    os.utime(ypath, (0, 0))
    assert not tools.tpu_yield_requested()
    # clear removes it
    tools.request_tpu_yield()
    tools.clear_tpu_yield()
    assert not os.path.exists(ypath)
    assert not tools.tpu_yield_requested()


def test_lock_waiter_requests_yield(tmp_path, monkeypatch):
    """A blocked PREEMPTING acquire_tpu_lock (the bench capture) must leave
    a yield request behind even when its deadline-capped wait expires (the
    holder honors it at its next chunk boundary); an ordinary waiter must
    queue politely without requesting a yield."""
    lpath = str(tmp_path / "lock")
    ypath = str(tmp_path / "yield")
    monkeypatch.setenv("TPU_LOCK_PATH", lpath)
    monkeypatch.setenv("TPU_YIELD_PATH", ypath)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")  # env only; jax stays on cpu
    monkeypatch.setattr(tools, "_TPU_LOCK_FD", None)

    # simulate another process holding the chip: flock via a separate fd
    # (flock is per open-file-description, so same-process fds conflict)
    holder = os.open(lpath, os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(holder, fcntl.LOCK_EX | fcntl.LOCK_NB)
        # a polite waiter (experiment driver) never evicts the holder
        assert tools.acquire_tpu_lock(wait_s=0.2) is False
        assert not os.path.exists(ypath), "polite waiter must not preempt"
        # the bench capture preempts
        assert tools.acquire_tpu_lock(wait_s=0.2, preempt=True) is False
        assert os.path.exists(ypath), "preempting waiter must touch the yield file"
        assert tools.tpu_yield_requested()
        assert tools._TPU_LOCK_FD is None
    finally:
        os.close(holder)

    # once the holder is gone, the next waiter acquires AND clears its
    # own satisfied request
    tools.request_tpu_yield()
    assert tools.acquire_tpu_lock(wait_s=5.0) is True
    assert not os.path.exists(ypath)
    # release for other tests (the fixture process would otherwise hold it)
    os.close(tools._TPU_LOCK_FD)
    monkeypatch.setattr(tools, "_TPU_LOCK_FD", None)


def test_trainer_yields_checkpoint_then_resumes(tmp_path, monkeypatch):
    """A yieldable lock-holding Trainer.train must checkpoint + SystemExit(3)
    at the first chunk boundary after a yield request, and a --resume-style
    restart must complete the schedule from that checkpoint."""
    ypath = str(tmp_path / "yield")
    monkeypatch.setenv("TPU_YIELD_PATH", ypath)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")  # env gate only (cpu jax)
    monkeypatch.setenv("TPU_YIELDABLE", "1")
    monkeypatch.setattr(tools, "holds_tpu_lock", lambda: True)

    cfg = _small_cfg(tmp_path)
    trainer = Trainer(cfg)
    tools.request_tpu_yield()
    with pytest.raises(SystemExit) as ei:
        trainer.train()
    assert ei.value.code == 3
    # yielded at the FIRST chunk boundary, well before the 12-iter schedule
    ckpts = [f for f in os.listdir(trainer.logdir) if f.endswith(".npz")]
    assert len(ckpts) == 1 and ckpts[0].startswith("yld_0000")
    yield_iter = int(ckpts[0][len("yld_"):-len(".npz")])
    assert yield_iter < cfg.n_iters - 1

    # non-yieldable contexts ignore the request entirely
    monkeypatch.setenv("TPU_YIELDABLE", "0")
    t2 = Trainer(cfg)  # auto-resumes from the yield checkpoint
    assert t2.start_step == yield_iter
    t2.train()
    assert os.path.exists(os.path.join(t2.logdir, "yld.npz"))


def test_trainer_never_yields_without_lock_or_optin(tmp_path, monkeypatch):
    monkeypatch.setenv("TPU_YIELD_PATH", str(tmp_path / "yield"))
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    cfg = _small_cfg(tmp_path, expname="noyld", n_iters=4)
    trainer = Trainer(cfg)
    tools.request_tpu_yield()
    # yieldable but NOT holding the lock -> keep training
    monkeypatch.setenv("TPU_YIELDABLE", "1")
    monkeypatch.setattr(tools, "holds_tpu_lock", lambda: False)
    trainer.train()
    assert os.path.exists(os.path.join(trainer.logdir, "noyld.npz"))
