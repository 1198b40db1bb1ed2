"""SemaFo ablation sweep (reference: ``examples/vae/semafo_final.py`` — the
paper's final experiment grid over SemaFo variants, label budgets, and the
mutual-information coefficient).

The reference script sweeps variant subclasses (G10..G80 = gamma, T01/T02 =
temperature, NoReparams, hierarchical SemafoHVAE ablations).  Here the
registered semafo family (`semafovae`, `remafovae`, `semafod/h/s/sm/sc/p/t`)
plays that role: pick variants + label budgets on the CLI and compare the
unsupervised disentanglement scores against the label-prediction quality.

Run::

  python examples/vae/semafo_final.py vae=semafovae,semafod,semafoh \\
      label_percent=0.004,0.1 -j 1
"""
import numpy as np

from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import get_networks
from odin_tpu.training import ScoreBoard, run_hydra

CONFIG = dict(ds="dspritessmall", vae="semafovae", label_percent=0.1,
              zdim=10, batch_size=64, max_iter=3000, lr=1e-3, mi_coef=0.2)


@run_hydra(output_dir="./results/semafo", config=CONFIG)
def main(cfg):
  ds = get_dataset(cfg.ds)
  nets = get_networks("dsprites", zdim=cfg.zdim, is_semi_supervised=True)
  nets.pop("labels", None)
  cls = get_vae(cfg.vae)
  vae = cls(labels=RVconf(5, "gaussian", projection=True, name="factors"),
            mi_coef=cfg.mi_coef, **nets).build()
  train = ds.create_dataset("train", batch_size=cfg.batch_size,
                            label_percent=cfg.label_percent, epochs=-1)
  vae.fit(train, max_iter=cfg.max_iter, learning_rate=cfg.lr,
          logdir=cfg.output_dir, verbose=False)

  # --- label prediction quality (the semi-supervised head) ----------------
  x_test, y_test = ds.numpy("test")
  x_test = ds.normalize255(x_test)[:1024]
  y_test = np.asarray(y_test)[:1024]
  qy = vae.predict_labels(x_test[:512])
  pred = np.asarray(qy.mean())
  from scipy.stats import spearmanr
  rho = np.mean([abs(spearmanr(pred[:, i], y_test[:512, i]).statistic)
                 for i in range(pred.shape[1])])

  # --- unsupervised representation quality --------------------------------
  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=128)
  gym.run_model(n_samples=2048, partition="test")
  scores = gym.write_report(scores=("elbo", "mig", "sap", "active_units"))

  row = dict(vae=cfg.vae, label_percent=float(cfg.label_percent),
             mi_coef=float(cfg.mi_coef), factor_rho=float(rho),
             **{k: v for k, v in scores.items() if isinstance(v, (int, float))})
  ScoreBoard("./results/scoreboard.db").write(
      "semafo_final", unique=["vae", "label_percent", "mi_coef"], **row)
  print({k: round(v, 4) if isinstance(v, float) else v
         for k, v in row.items()})
  return row


if __name__ == "__main__":
  main()
