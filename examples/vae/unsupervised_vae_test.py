"""Unsupervised disentanglement sweep (reference:
``examples/vae/unsupervised_vae_test.py``): beta/TC/Factor models compared
on the Gym score suite, results logged into the sqlite ScoreBoard.

Run::

  python examples/vae/unsupervised_vae_test.py vae=betavae,betatcvae,factorvae max_iter=1500
"""
from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import get_networks
from odin_tpu.training import ScoreBoard, run_hydra

CONFIG = dict(ds="dspritessmall", vae="betavae", zdim=10, batch_size=64,
              max_iter=1500, lr=1e-3)


@run_hydra(output_dir="./results/unsupervised", config=CONFIG)
def main(cfg):
  ds = get_dataset(cfg.ds)
  nets = get_networks("dsprites", zdim=cfg.zdim)
  vae = get_vae(cfg.vae)(**nets).build()
  train = ds.create_dataset("train", batch_size=cfg.batch_size, epochs=-1)
  vae.fit(train, max_iter=cfg.max_iter, learning_rate=cfg.lr,
          logdir=cfg.output_dir)
  gym = DisentanglementGym(dataset=ds, model=vae)
  gym.run_model(n_samples=1000, partition="test")
  scores = gym.write_report(scores=("elbo", "mig", "sap", "dci",
                                    "factorvae", "active_units"))
  ScoreBoard("./results/scoreboard.db").write(
      "unsupervised", unique=["vae", "ds"], vae=cfg.vae, ds=cfg.ds,
      **{k: v for k, v in scores.items() if isinstance(v, (int, float))})
  print(cfg.vae, {k: round(v, 4) if isinstance(v, float) else v
                  for k, v in scores.items()})
  return scores


if __name__ == "__main__":
  main()
