"""Hierarchical (ladder) VAE sweep (reference:
``examples/vae/hierarchical_vae_test.py``): trains a BiConvLatents ladder
VAE and reports per-layer KL so posterior collapse of individual rungs is
visible.

Run::

  python examples/vae/hierarchical_vae_test.py vae=hierarchicalvae max_iter=5000
"""
import numpy as np

from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import get_networks
from odin_tpu.training import run_hydra

CONFIG = dict(ds="dspritessmall", vae="hierarchicalvae", zdim=10,
              batch_size=32, max_iter=5000, lr=1e-3, free_bits=0.25,
              eval_samples=1000)


@run_hydra(output_dir="./results/hierarchical", config=CONFIG)
def main(cfg):
  ds = get_dataset(cfg.ds)
  nets = get_networks("dsprites", zdim=cfg.zdim, is_hierarchical=True)
  vae = get_vae(cfg.vae)(free_bits=cfg.free_bits, **nets).build()
  train = ds.create_dataset("train", batch_size=cfg.batch_size, epochs=-1)
  valid = ds.create_dataset("valid", batch_size=cfg.batch_size, epochs=1)
  trainer = vae.fit(train, valid=valid, max_iter=cfg.max_iter,
                    learning_rate=cfg.lr,
                    valid_freq=max(cfg.max_iter // 5, 1),
                    logdir=cfg.output_dir)
  # per-layer KL from the last validation record: collapsed rungs sit at
  # the free-bits floor
  last = trainer.history[-1]
  kls = {k: v for k, v in last.items() if k.startswith("kl_")}
  print("per-layer KL:", {k: round(float(v), 4) for k, v in kls.items()})
  gym = DisentanglementGym(dataset=ds, model=vae)
  gym.run_model(n_samples=cfg.eval_samples, partition="test")
  report = gym.write_report(path=f"{cfg.output_dir}/report.txt")
  print({k: round(v, 4) if isinstance(v, float) else v
         for k, v in report.items()})
  return report


if __name__ == "__main__":
  main()
