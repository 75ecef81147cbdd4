"""Two-process pod smoke: the parallel layer's pod code paths
(put_replicated / put_batch_sharded via make_array_from_callback, lead-
process gating) run under a REAL multi-process jax.distributed runtime —
two CPU processes with 4 local devices each forming one 8-device global
mesh.  This is the strongest pod-readiness check this single-host image
allows (SURVEY §5.8: same program, bigger mesh; VERDICT r2 missing #5).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

sys.path.insert(0, sys.argv[3])
from egonerf_tpu.parallel.mesh import (DATA_AXIS, is_lead_process, make_mesh,
                                       put_batch_sharded, put_replicated,
                                       replicate_tree, replicated)

mesh = make_mesh()
assert mesh.devices.size == 8, mesh.devices.size
assert len(jax.local_devices()) == 4
assert is_lead_process() == (jax.process_index() == 0)

# every process holds the same host data (seed-identical pipeline)
data = np.arange(64, dtype=np.float32).reshape(8, 8)
params = {"w": np.full((4,), 2.0, np.float32)}

rep = put_replicated(mesh, data)
batch = put_batch_sharded(mesh, data, P(DATA_AXIS, None))
tree = replicate_tree(mesh, params)

def step(b, r, p):
    # a sharded reduction (XLA inserts the psum) + replicated reads
    return jnp.sum(b * p["w"][0]) + jnp.sum(r)

fn = jax.jit(step, out_shardings=replicated(mesh))
out = float(fn(batch, rep, tree))
want = float(data.sum() * 2.0 + data.sum())
assert abs(out - want) < 1e-3, (out, want)
print(f"POD_OK process={jax.process_index()} out={out}", flush=True)
"""


def _run_pod(tmp_path, worker_src: str, extra_args=(), timeout=420):
    # the two workers compile a full train step each; when the suite
    # shares the box with other jobs (e.g. a TPU eval sweep) compile wall
    # stretches with the load average — scale the budget so contention
    # doesn't read as a hang (observed: 420 s trips under load ~8, passes
    # in 142 s on an idle box)
    load = os.getloadavg()[0] / max(1, os.cpu_count())
    timeout = timeout * min(3.0, 1.0 + load)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "pod_worker.py"
    script.write_text(worker_src)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no 8-device forcing; 4 per process
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i), REPO,
                          *map(str, extra_args)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("pod worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
    return outs


def test_two_process_cpu_pod_smoke(tmp_path):
    outs = _run_pod(tmp_path, WORKER, timeout=300)
    for out in outs:
        assert "POD_OK" in out


TRAINER_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))

import os
import numpy as np

sys.path.insert(0, sys.argv[3])
from egonerf_tpu.train.config import load_config
from egonerf_tpu.train.trainer import Trainer

basedir = sys.argv[4]
cfg = load_config(overrides=dict(
    dataset_name="synthetic", model_name="EgoNeRF", coordinates_name="yinyang",
    exp_sampling=True, interval_th=True, r0="0.05", resampling=True,
    use_coarse_sample=True, n_coarse=12, n_fine=12, batch_size=256,
    n_iters=8, N_voxel_init=16**3, N_voxel_final=28**3, upsamp_list="[3]",
    n_lamb_sigma="[4,4,4]", n_lamb_sh="[8,8,8]", data_dim_color=12,
    shadingMode="MLP_Fea", density_shift="-8", featureC=32, view_pe=2, fea_pe=2,
    near_far="[0.05, 8.5]", basedir=basedir, expname="pod",
    N_vis=0, i_weights=10**7, eval_chunk=256, sparsity_lambda=0,
    steps_per_call=4,
))
trainer = Trainer(cfg)
assert trainer.mesh is not None and trainer.mesh.devices.size == 8
assert trainer.lead == (jax.process_index() == 0)
assert trainer.log.enabled == trainer.lead  # one writer per pod
trainer.train()

# replicated state must be identical on every process after the full run
# (including the upsample surgery's re-replication at iter 3)
fp = float(sum(float(np.abs(np.asarray(jax.device_get(x))).sum())
               for x in jax.tree_util.tree_leaves(trainer.params)))
reso = tuple(trainer.reso_cur)
print(f"TRAINER_OK process={jax.process_index()} fp={fp:.6f} reso={reso}",
      flush=True)
"""


def test_two_process_trainer_across_upsample(tmp_path):
    """The REAL Trainer under a 2-process jax.distributed runtime, crossing
    an upsample boundary (param surgery + optimizer rebuild + cross-host
    re-replication): both processes must finish with bit-identical
    replicated params and the lead process alone must have written the
    logdir artifacts."""
    basedir = tmp_path / "log"
    outs = _run_pod(tmp_path, TRAINER_WORKER, extra_args=[basedir])

    import re

    fps, resos = [], []
    for out in outs:
        m = re.search(r"TRAINER_OK process=\d+ fp=([\d.]+) reso=(\([^)]*\))", out)
        assert m, f"worker output missing TRAINER_OK:\n{out[-3000:]}"
        fps.append(float(m.group(1)))
        resos.append(m.group(2))
    assert fps[0] == pytest.approx(fps[1], rel=0, abs=0.0), fps
    assert resos[0] == resos[1]
    # lead-process IO actually happened (checkpoint + metrics)
    logdir = basedir / "pod"
    assert (logdir / "pod.npz").exists()
    assert (logdir / "metrics.jsonl").exists()
