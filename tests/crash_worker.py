"""Training process for the crash-recovery test: trains a tiny dense VAE
forever, writing non-blocking checkpoints every few steps.  The parent test
SIGKILLs it mid-run and must find an intact (atomically-replaced) checkpoint
to resume from — the failure-handling contract of SURVEY §5
("per-step checkpoint + deterministic resume").
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def make_vae():
  from odin_tpu.bay.random_variable import RVconf
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks.base import Dense, Flatten, SequentialNetwork
  enc = SequentialNetwork((Flatten(), Dense(64, "relu"), Dense(64, None)),
                          name="encoder")
  dec = SequentialNetwork((Dense(64, "relu"), Dense(16, None)),
                          name="decoder")
  return BetaVAE(encoder=enc, decoder=dec,
                 latents=RVconf((8,), "mvndiag", projection=True,
                                name="latents"),
                 observation=RVconf((16,), "gaussian", projection=True,
                                    name="obs"),
                 input_shape=(16,)).build(seed=3)


def main():
  logdir = sys.argv[1]
  from odin_tpu.training.trainer import Trainer
  vae = make_vae()
  step = vae.make_step_fn(learning_rate=1e-2)
  state = jax.device_get(vae.state)  # AFTER make_step_fn (opt_states init)
  tr = Trainer(logdir=logdir, use_tensorboard=False, logging_interval=3600)

  def batches():
    rng = np.random.RandomState(0)
    while True:
      yield rng.rand(16, 16).astype("f")

  print("worker ready", flush=True)
  tr.fit(batches(), step, state, checkpoint_freq=3, verbose=False)


if __name__ == "__main__":
  main()
