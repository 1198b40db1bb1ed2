"""Multi-HOST data parallelism: two OS processes, each owning half of the
virtual CPU devices, form ONE global mesh through `jax.distributed`
(Gloo collectives) and train the same model — final params must match the
single-process mesh run.

This exercises the cluster-level path that everything else in
tests/test_parallel.py runs single-process: `parallel.initialize_distributed`
(which must NOT touch the XLA backend before `jax.distributed.initialize` —
a real bug this test caught) and `parallel.host_local_batch`
(`jax.make_array_from_process_local_data` assembling one logical batch from
per-process slices).  Reference counterpart: the `MPI` worker pool
(``odin/utils/mpi.py:386``) — the closest thing the reference has to
multi-host execution.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # three fresh interpreters, each compiling

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
  s = socket.socket()
  s.bind(("127.0.0.1", 0))
  port = s.getsockname()[1]
  s.close()
  return port


def _clean_env():
  # the worker sets its own device count; drop the conftest's XLA_FLAGS so
  # the two --xla_force_host_platform_device_count flags don't collide
  env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
  env["JAX_PLATFORMS"] = "cpu"
  return env


def test_multihost_training_matches_single_process(tmp_path):
  port = _free_port()
  env = _clean_env()
  out_mh = tmp_path / "mh.npz"
  out_sp = tmp_path / "sp.npz"
  procs = [
      subprocess.Popen(
          [sys.executable, WORKER,
           "--process-id", str(i), "--num-processes", "2",
           "--port", str(port), "--local-devices", "2",
           "--out", str(out_mh if i == 0 else tmp_path / "junk.npz")],
          cwd=REPO, env=env,
          stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
      for i in (0, 1)]
  outs = [p.communicate(timeout=420) for p in procs]
  for p, (so, se) in zip(procs, outs):
    assert p.returncode == 0, f"worker failed:\n{so[-1000:]}\n{se[-3000:]}"

  ref = subprocess.run(
      [sys.executable, WORKER, "--num-processes", "1",
       "--local-devices", "4", "--out", str(out_sp)],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
  assert ref.returncode == 0, ref.stderr[-3000:]

  mh, sp = np.load(out_mh), np.load(out_sp)
  assert set(mh.files) == set(sp.files) and len(mh.files) > 4
  np.testing.assert_allclose(mh["__losses__"], sp["__losses__"],
                             rtol=1e-5, atol=1e-5)
  for k in mh.files:
    np.testing.assert_allclose(mh[k], sp[k], rtol=1e-5, atol=1e-5,
                               err_msg=k)


def test_multihost_gmm_estep_matches_single_process(tmp_path):
  """GMM sufficient statistics (Z/F/S/llk) from per-process corpus slices
  psum-reduce to the single-process full-corpus E-step."""
  port = _free_port()
  env = _clean_env()
  out_mh = tmp_path / "gmm_mh.npz"
  out_sp = tmp_path / "gmm_sp.npz"
  procs = [
      subprocess.Popen(
          [sys.executable, WORKER, "--mode", "gmm",
           "--process-id", str(i), "--num-processes", "2",
           "--port", str(port), "--local-devices", "2",
           "--out", str(out_mh if i == 0 else tmp_path / "junk.npz")],
          cwd=REPO, env=env,
          stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
      for i in (0, 1)]
  outs = [p.communicate(timeout=420) for p in procs]
  for p, (so, se) in zip(procs, outs):
    assert p.returncode == 0, f"worker failed:\n{so[-1000:]}\n{se[-3000:]}"
  ref = subprocess.run(
      [sys.executable, WORKER, "--mode", "gmm", "--num-processes", "1",
       "--local-devices", "4", "--out", str(out_sp)],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
  assert ref.returncode == 0, ref.stderr[-3000:]
  mh, sp = np.load(out_mh), np.load(out_sp)
  for k in ("Z", "F", "S", "llk", "LU", "RU", "tllk"):
    np.testing.assert_allclose(mh[k], sp[k], rtol=1e-5, atol=1e-4,
                               err_msg=k)
