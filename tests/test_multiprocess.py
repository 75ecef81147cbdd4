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


def test_two_process_cpu_pod_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "pod_worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no 8-device forcing; 4 per process
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i), REPO],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("pod smoke timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert "POD_OK" in out
