"""Re-evaluate the saved round-2 ladder + flat checkpoints under the
corrected Gym (elbo/llk/kl now come from `elbo_components`, so ladder-rung
KLs are counted).  Writes the final recorded jsons."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from odin_tpu.bay.vi import BetaVAE, DisentanglementGym, HierarchicalVAE
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))


def gym_report(vae, ds, tag):
  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
  gym.run_model(n_samples=10_000, partition="test")
  rep = gym.write_report(path=os.path.join(OUT, f"{tag}_report.txt"))
  gym.plot_latents_traverse(path=os.path.join(OUT, f"{tag}_traverse.png"))
  gym.plot_correlation(path=os.path.join(OUT, f"{tag}_correlation.png"))
  gym.plot_histogram(path=os.path.join(OUT, f"{tag}_histogram.png"))
  return rep


def main():
  ds = dSprites(n_samples=65_536)
  vae = HierarchicalVAE(
      **get_networks("dsprites", zdim=10, is_hierarchical=True)).build(seed=1)
  vae.load_weights(os.path.join(OUT, "hvae_dsprites_r2_100k.pkl"))
  rep = gym_report(vae, ds, "hvae_r2")
  rep["steps_per_sec"] = 141.5  # recorded during the 100k-step training run
  with open(os.path.join(OUT, "hvae_dsprites_r2_100k.json"), "w") as f:
    json.dump(rep, f, indent=1)
  print("LADDER", {k: round(v, 4) if isinstance(v, float) else v
                   for k, v in rep.items()}, flush=True)

  flat = BetaVAE(beta=4.0, **get_networks("dsprites", zdim=10)).build(seed=1)
  flat.load_weights(os.path.join(OUT, "..", "betavae_dsprites_150k.pkl"))
  rep_flat = gym_report(flat, ds, "betavae4_r2proto")
  with open(os.path.join(OUT, "betavae4_10k_protocol.json"), "w") as f:
    json.dump(rep_flat, f, indent=1)
  print("FLAT", {k: round(v, 4) if isinstance(v, float) else v
                 for k, v in rep_flat.items()}, flush=True)
  print(f"BAND CHECK: ladder elbo {rep['elbo']:.1f} "
        f"vs flat {rep_flat['elbo']:.1f}", flush=True)


if __name__ == "__main__":
  main()
