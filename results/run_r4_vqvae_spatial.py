"""Round-4 VQ-VAE rescue run (VERDICT r3 weak #3).

The round-1 recorded run (results/vqvae_dsprites_100k.json) quantized ONE
bottleneck vector per image and half-collapsed: perplexity 24.5, 33/128
codes active, test llk -471.  This run uses the reference's ACTUAL design
(``odin/bay/vi/autoencoder/vq_vae.py:60-247``): quantize the 8x8 conv
feature map (64 codes per image) with EMA codebook updates + in-graph
dead-code restarts — same corpus (procedural dSprites 65,536), same budget
(100k steps, batch 64), same eval protocol (3,000 held-out images).

Success bar: >=50% codebook usage (perplexity >= 64/128) and materially
better llk than the collapsed run.

Run on the TPU:  python results/run_r4_vqvae_spatial.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from odin_tpu.bay.vi import VQVAE
from odin_tpu.fuel import dSprites
from odin_tpu.networks.image_networks import vq_dsprites_networks

OUT = os.path.dirname(os.path.abspath(__file__))
STEPS = 100_000
BATCH = 64
N_CODES = 128


def main():
  eval_only = "--eval-only" in sys.argv
  ds = dSprites(n_samples=65_536)
  x_test = ds.normalize255(ds.numpy("test", inc_labels=False))[:3000]

  vae = VQVAE(spatial=True, ema=True, restart_dead=True,
              n_codes=N_CODES, code_dim=32,
              **vq_dsprites_networks()).build(seed=1)
  pkl = os.path.join(OUT, "vqvae_spatial_dsprites_100k.pkl")
  if eval_only:
    # retro-eval of an already-trained checkpoint (the first run's eval
    # crashed on the numpy-codebook fancy-indexing bug, fixed in
    # vq_vae.py; the training pkl was saved before the crash)
    vae.load_weights(pkl)
    dt = float("inf")
  else:
    x_train = ds.normalize255(ds.numpy("train", inc_labels=False))
    sched = optax.exponential_decay(1e-3, transition_steps=10_000,
                                    decay_rate=0.996)
    t0 = time.time()
    vae.fit_device_dataset(x_train, n_steps=STEPS, batch_size=BATCH,
                           learning_rate=sched, steps_per_call=1000,
                           global_clipnorm=100.0, seed=1)
    dt = time.time() - t0
    print(f"{STEPS} steps in {dt:.0f}s = {STEPS / dt:.0f} steps/s",
          flush=True)
    vae.save_weights(pkl)

  # --- eval: llk, MSE, codebook health on held-out images
  params = vae.state.params
  mut = vae.state.mutables

  @jax.jit
  def eval_batch(xb):
    llk, kl, aux = vae.elbo_components(params, xb, jax.random.PRNGKey(0),
                                       0, False, mut)
    recon = aux["px"].mean()
    mse = jnp.mean((recon - xb) ** 2, axis=(1, 2, 3))
    return llk["llk_image"], mse, aux["qz"].indices

  def _perplexity(ids):
    counts = np.bincount(ids, minlength=N_CODES)
    p = counts / max(counts.sum(), 1)
    return float(np.exp(-np.sum(p * np.log(p + 1e-10)))), counts

  llks, mses, idxs, fg = [], [], [], []
  for i in range(0, len(x_test), 250):
    xb = x_test[i:i + 250]
    l, m, ix = eval_batch(jnp.asarray(xb))
    llks.append(np.asarray(l))
    mses.append(np.asarray(m))
    ix = np.asarray(ix)                                   # (B, 8, 8)
    idxs.append(ix.reshape(-1))
    # foreground mask per 8x8 cell: any sprite pixel in its 8x8 block.
    # ~90% of dSprites cells are empty background collapsing onto a few
    # codes, so ALL-positions perplexity is low for any model; code
    # DIVERSITY where content exists is the honest health metric.
    cells = xb.reshape(len(xb), 8, 8, 8, 8, 1).max(axis=(2, 4, 5)) > 0.5
    fg.append(ix[cells])
  idxs = np.concatenate(idxs)
  perplexity, counts = _perplexity(idxs)
  fg_perplexity, _ = _perplexity(np.concatenate(fg))
  rep = dict(steps=STEPS,
             steps_per_sec=None if eval_only else round(STEPS / dt, 1),
             test_llk=float(np.mean(np.concatenate(llks))),
             test_mse=float(np.mean(np.concatenate(mses))),
             codebook_perplexity=round(perplexity, 1),
             foreground_perplexity=round(fg_perplexity, 1),
             active_codes=int((counts > 0).sum()),
             n_codes=N_CODES,
             codes_per_image=64,
             config="spatial 8x8 code map, EMA + dead-code restarts",
             collapsed_baseline="results/vqvae_dsprites_100k.json")
  with open(os.path.join(OUT, "vqvae_spatial_dsprites_100k.json"),
            "w") as f:
    json.dump(rep, f, indent=1)
  print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
