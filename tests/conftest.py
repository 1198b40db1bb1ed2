"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (the standard JAX
substitute for multi-node fakes; see SURVEY.md §4).

The environment pins JAX_PLATFORMS=axon (the TPU tunnel) for every process,
so this must *overwrite*, not setdefault — and also update jax.config in case
jax was already imported by sitecustomize.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  # 4 virtual devices (not 8): this box has ONE physical core, so the N
  # device programs of a collective execute serially and the last arrival
  # trails by (N-1) x step-time; XLA's rendezvous hard-kills at 40s
  # (xla_cpu_collective_call_* DebugOptions are not registered as XLA_FLAGS
  # in this jaxlib). 4 devices keeps the stagger under the limit while
  # still exercising real sharding + psum paths.
  flags += " --xla_force_host_platform_device_count=4"
if "collective" not in flags:
  flags += " --xla_cpu_collective_timeout_seconds=3600"
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
