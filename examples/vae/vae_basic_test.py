"""Basic VAE training (reference: ``examples/vae/vae_basic_test.py:96-120``).

Run::

  python examples/vae/vae_basic_test.py vae=betavae beta=4 max_iter=2000

Uses the procedural dSprites when no real dataset cache exists.
"""
from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import get_networks, get_optimizer_info
from odin_tpu.training import run_hydra

CONFIG = dict(ds="dspritessmall", vae="betavae", beta=1.0, zdim=10,
              batch_size=32, max_iter=2000, lr=1e-3, eval_samples=1000)


@run_hydra(output_dir="./results/vae_basic", config=CONFIG)
def main(cfg):
  ds = get_dataset(cfg.ds)
  nets = get_networks(
      "dsprites" if "dsprites" in cfg.ds else cfg.ds, zdim=cfg.zdim)
  cls = get_vae(cfg.vae)
  kwargs = {"beta": cfg.beta} if "beta" in cls.__init__.__code__.co_varnames \
      else {}
  vae = cls(**kwargs, **nets).build()
  train = ds.create_dataset("train", batch_size=cfg.batch_size, epochs=-1)
  valid = ds.create_dataset("valid", batch_size=cfg.batch_size, epochs=1)
  vae.fit(train, valid=valid, max_iter=cfg.max_iter, learning_rate=cfg.lr,
          valid_freq=max(cfg.max_iter // 5, 1), logdir=cfg.output_dir)
  gym = DisentanglementGym(dataset=ds, model=vae)
  gym.run_model(n_samples=cfg.eval_samples, partition="test")
  report = gym.write_report(path=f"{cfg.output_dir}/report.txt")
  gym.plot_reconstruction(path=f"{cfg.output_dir}/reconstruction.png")
  gym.plot_correlation(path=f"{cfg.output_dir}/correlation.png")
  print({k: round(v, 4) if isinstance(v, float) else v
         for k, v in report.items()})
  return report


if __name__ == "__main__":
  main()
