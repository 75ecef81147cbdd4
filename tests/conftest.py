"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware.

The env-var route (JAX_PLATFORMS / XLA_FLAGS) is unreliable when a site
hook has already registered an accelerator plugin, so the platform and
device count are forced through jax.config before any backend initializes.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialized (e.g. single-process reuse) — tests
    # that need 8 devices will skip/fail loudly rather than silently

from egonerf_tpu.tools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # repo-local persistent cache: repeat suite runs
# skip the multi-minute XLA compiles (entries are keyed by backend+topology,
# so the CPU-mesh tests never collide with TPU bench entries)
