"""Fault injection: SIGKILL a training process mid-run, then resume.

The reference has no fault injection anywhere (SURVEY §5); its failure
story is best-weights restore + terminate().  Here the contract is
stronger: checkpoints are written atomically (tmp + os.replace) on a
background thread, so a hard kill — even one landing mid-write — leaves an
intact checkpoint from which training resumes with the optimizer state and
step counter intact.
"""
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
import jax

pytestmark = pytest.mark.slow  # subprocess + two make_step_fn compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "crash_worker.py")


def test_sigkill_mid_run_resumes_from_intact_checkpoint(tmp_path):
  env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
  env["JAX_PLATFORMS"] = "cpu"
  proc = subprocess.Popen([sys.executable, WORKER, str(tmp_path)],
                          cwd=REPO, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.PIPE, text=True)
  ckpt = tmp_path / "checkpoint"
  try:
    deadline = time.time() + 300
    # wait for the first durable checkpoint, then let several replace it so
    # the SIGKILL has a fair chance of landing mid-write
    while time.time() < deadline and not ckpt.exists():
      if proc.poll() is not None:
        raise AssertionError(f"worker died early:\n{proc.stderr.read()[-3000:]}")
      time.sleep(0.25)
    assert ckpt.exists(), "no checkpoint appeared within the deadline"
    time.sleep(2.0)
  finally:
    if proc.poll() is None:
      os.kill(proc.pid, signal.SIGKILL)
    proc.wait(timeout=60)

  # the checkpoint must be intact (atomic replace) and resumable
  from odin_tpu.training.trainer import Trainer
  from tests.crash_worker import make_vae
  tr = Trainer(logdir=str(tmp_path), use_tensorboard=False)
  state = tr.restore_checkpoint()
  assert state is not None
  step0 = int(np.asarray(jax.device_get(state.step)))
  assert step0 >= 3, f"checkpoint stuck at step {step0}"

  vae = make_vae()
  step_fn = vae.make_step_fn(learning_rate=1e-2)
  st = jax.device_put(state)
  rng = np.random.RandomState(1)
  for _ in range(3):
    st, m = step_fn(st, rng.rand(16, 16).astype("f"))
  assert int(np.asarray(jax.device_get(st.step))) == step0 + 3
  assert np.isfinite(float(m["loss"]))
