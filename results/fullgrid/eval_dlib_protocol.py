"""Re-score saved full-grid checkpoints under BOTH metric protocols.

Round-4 finding: every published dSprites number (Locatello et al. 2019's
large-scale study and successors) is computed with disentanglement_lib's
protocol — posterior MEAN representation, pair batches of 64, 10,000 votes,
20-bin MIG discretization — while the reference's own kernels
(``odin/bay/vi/downstream_metrics.py:399,431``) draw 10 MCMC samples of z,
average pair batches of 10, take 2,000 votes, and bin MIG at 8.  Those
choices systematically depress the scores of the SAME representation, so
"reference protocol" numbers are not comparable to the published range.

This script loads each finished ``results/fullgrid/<model>_fullgrid.pkl``,
re-runs the gym eval on the same 10k held-out protocol, and records the
reference-protocol and dlib-protocol scores side by side in
``<model>_dlib.json``.  CPU-only (op-by-op host inference) so it can run
next to the TPU training queue.

Usage: python results/fullgrid/eval_dlib_protocol.py [model ...]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))

BUILDERS = {
    "betavae4": lambda nets: get_vae("betavae")(beta=4.0, **nets),
    "betavae8": lambda nets: get_vae("betavae")(beta=8.0, **nets),
    "factorvae": lambda nets: get_vae("factorvae")(
        tc_coef=35.0, discriminator_lr=1e-4, **nets),
    "adagvae": lambda nets: get_vae("adaptivevae")(**nets),
}


def main():
  models = sys.argv[1:] or list(BUILDERS)
  ds = dSprites(full_grid=True)
  for name in models:
    pkl = os.path.join(OUT, f"{name}_fullgrid.pkl")
    if not os.path.exists(pkl):
      print(f"[{name}] no checkpoint at {pkl}; skipping", flush=True)
      continue
    t0 = time.time()
    nets = get_networks("dsprites", zdim=10)
    vae = BUILDERS[name](nets)
    vae.build(seed=1)
    vae.load_weights(pkl)
    gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
    gym.run_model(n_samples=10_000, partition="test")
    rep = dict(
        # the literature-comparable rate/ELBO (the *_fullgrid.json
        # "kl_divergence" is the OBJECTIVE's KL term: beta-scaled for
        # BetaVAE, +tc_coef*TC for FactorVAE — see gym.kl_unweighted)
        kl_unweighted=gym.kl_unweighted(),
        elbo_unweighted=gym.elbo_unweighted(),
        log_likelihood=gym.log_likelihood())
    for proto in ("reference", "dlib"):
      rep[f"betavae_score_{proto}"] = gym.betavae_score(protocol=proto)
      rep[f"factorvae_score_{proto}"] = gym.factorvae_score(protocol=proto)
      rep[f"mig_{proto}"] = gym.mig_score(protocol=proto)
    rep.update(model=name, eval_samples=10_000,
               wallclock_sec=round(time.time() - t0),
               note="reference protocol: 10 MCMC z-samples, pair batch 10 "
                    "(beta)/256 (factor), 2k votes, 8-bin MIG; dlib "
                    "protocol: posterior mean, pair batch 64, 10k votes, "
                    "std<0.05 pruning, 20-bin MIG (the published protocol)")
    path = os.path.join(OUT, f"{name}_dlib.json")
    with open(path, "w") as f:
      json.dump(rep, f, indent=1)
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
