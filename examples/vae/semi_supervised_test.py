"""Semi-supervised VAE comparison (reference: ``examples/vae/semafo_final.py``
and the M2 experiments): Multitask / M2 / Semafo on a fraction of labels.

Run: ``python examples/vae/semi_supervised_test.py vae=semafovae label_percent=0.1``
"""
import numpy as np

from odin_tpu.bay.vi import get_vae
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import get_networks
from odin_tpu.training import ScoreBoard, run_hydra

CONFIG = dict(ds="dspritessmall", vae="multitaskvae", label_percent=0.1,
              zdim=10, batch_size=64, max_iter=2000, lr=1e-3, alpha=10.0)


@run_hydra(output_dir="./results/semi", config=CONFIG)
def main(cfg):
  ds = get_dataset(cfg.ds)
  nets = get_networks("dsprites", zdim=cfg.zdim, is_semi_supervised=True)
  # the labels head comes from the model's own config for these families
  nets.pop("labels", None)
  cls = get_vae(cfg.vae)
  from odin_tpu.bay.random_variable import RVconf
  vae = cls(labels=RVconf(5, "gaussian", projection=True, name="factors"),
            alpha=cfg.alpha, **nets).build()
  train = ds.create_dataset("train", batch_size=cfg.batch_size,
                            label_percent=cfg.label_percent, epochs=-1)
  vae.fit(train, max_iter=cfg.max_iter, learning_rate=cfg.lr,
          logdir=cfg.output_dir)
  # factor-prediction quality on held-out data
  x_test, y_test = ds.numpy("test")
  x_test = ds.normalize255(x_test)[:512]
  y_test = np.asarray(y_test)[:512]
  qy = vae.predict_labels(x_test[:256])
  pred = np.asarray(qy.mean())
  from scipy.stats import spearmanr
  rho = np.mean([abs(spearmanr(pred[:, i], y_test[:256, i]).statistic)
                 for i in range(pred.shape[1])])
  print(f"{cfg.vae}: mean |spearman(factor_hat, factor)| = {rho:.3f}")
  ScoreBoard("./results/scoreboard.db").write(
      "semi", unique=["vae", "label_percent"], vae=cfg.vae,
      label_percent=cfg.label_percent, factor_rho=float(rho))
  return float(rho)


if __name__ == "__main__":
  main()
