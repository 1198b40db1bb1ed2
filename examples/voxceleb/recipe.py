"""VoxCeleb-style speaker-verification recipe (reference:
``examples/voxceleb``): directory-of-wavs corpus -> FeatureProcessor
extraction to disk -> x-vector training -> PLDA trial scoring ->
EER / minDCF.

With no real corpus on disk (this environment has no egress) the recipe
falls back to the synthetic multi-speaker corpus from the tidigits example,
exercising the identical pipeline end-to-end.

Run::

  python examples/voxceleb/recipe.py data_dir=/path/to/voxceleb1 max_iter=2000
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tidigits"))

from odin_tpu.backend import compute_EER, compute_minDCF
from odin_tpu.ml import PLDA
from odin_tpu.ops.features import FeatureConfig
from odin_tpu.preprocessing import batch_speech_features, read_wave
from odin_tpu.training import run_hydra

CONFIG = dict(data_dir="", n_speakers=16, n_utt=10, max_iter=1200, lr=1e-3,
              embedding_dim=64, n_phi=16, batch_size=32)


def load_corpus(cfg):
  """-> (list of float32 waves, labels).  Real data: data_dir/<spk>/*.wav;
  otherwise the synthetic stand-in."""
  if cfg.data_dir and os.path.isdir(cfg.data_dir):
    utts, labels, spk2id = [], [], {}
    for path in sorted(glob.glob(os.path.join(cfg.data_dir, "*", "**",
                                              "*.wav"), recursive=True)):
      spk = os.path.relpath(path, cfg.data_dir).split(os.sep)[0]
      sid = spk2id.setdefault(spk, len(spk2id))
      y, sr = read_wave(path)
      utts.append(y.astype("f"))
      labels.append(sid)
    print(f"loaded {len(utts)} utterances / {len(spk2id)} speakers")
    return utts, np.asarray(labels)
  from ivec import synth_speaker_audio
  return synth_speaker_audio(cfg.n_speakers, cfg.n_utt)


def make_trials(labels, n_trials=2000, seed=0):
  """Balanced target/nontarget trial pairs over utterance indices."""
  rng = np.random.RandomState(seed)
  n = len(labels)
  pairs, truth = [], []
  while len(pairs) < n_trials:
    i, j = rng.randint(0, n, 2)
    if i == j:
      continue
    pairs.append((i, j))
    truth.append(labels[i] == labels[j])
  return np.asarray(pairs), np.asarray(truth)


@run_hydra(output_dir="./results/voxceleb", config=CONFIG)
def main(cfg):
  import jax
  import jax.numpy as jnp
  import optax

  from odin_tpu.networks.time_delay import XVectorNet
  from odin_tpu.training import TrainState

  utts, labels = load_corpus(cfg)
  n_spk = int(labels.max()) + 1
  feats = batch_speech_features(utts, FeatureConfig(n_mels=24, n_ceps=14),
                                features=("mfcc_cmvn",))
  X = np.stack([f["mfcc_cmvn"] for f in feats]).astype("f")

  net = XVectorNet(n_classes=n_spk, embedding_dim=cfg.embedding_dim)
  rng = jax.random.PRNGKey(0)
  params = net.init(rng, jnp.asarray(X[:1]))["params"]
  opt = optax.adamw(cfg.lr, weight_decay=1e-4)
  state = TrainState(params={"net": params},
                     opt_states={"net": opt.init(params)},
                     step=jnp.zeros((), jnp.int32), rng=rng)

  def loss_fn(p, batch):
    x, y = batch
    logits = net.apply({"params": p}, x, training=True)
    return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(len(y)), y])

  @jax.jit
  def step_fn(state, batch):
    loss, grads = jax.value_and_grad(loss_fn)(state.params["net"], batch)
    updates, new_opt = opt.update(grads, state.opt_states["net"],
                                  state.params["net"])
    return state.replace(
        params={"net": optax.apply_updates(state.params["net"], updates)},
        opt_states={"net": new_opt}, step=state.step + 1), loss

  r = np.random.RandomState(1)
  for i in range(cfg.max_iter):
    idx = r.randint(0, len(X), cfg.batch_size)
    state, loss = step_fn(state, (jnp.asarray(X[idx]), jnp.asarray(labels[idx])))
    if i % max(cfg.max_iter // 10, 1) == 0:
      print(f"#{i} loss={float(loss):.4f}")

  embed = jax.jit(lambda x: net.apply({"params": state.params["net"]}, x,
                                      training=False, return_embedding=True))
  vecs = np.asarray(embed(jnp.asarray(X)))

  # PLDA backend on half the speakers; trials over the held-out half
  held = labels >= n_spk // 2
  plda = PLDA(n_phi=min(cfg.n_phi, cfg.embedding_dim // 2),
              n_iter=8).fit(vecs[~held], labels[~held])
  pairs, truth = make_trials(labels[held].astype(int))
  v = vecs[held]
  scores = plda.score_trials(v[pairs[:, 0]], v[pairs[:, 1]])
  from odin_tpu.backend.metrics import det_curve
  Pfa, Pmiss = det_curve(truth, scores)[:2]
  eer = compute_EER(Pfa, Pmiss)
  mindcf, _ = compute_minDCF(Pfa, Pmiss)
  print(f"PLDA trials: EER={eer:.4f} minDCF={mindcf:.4f} "
        f"({truth.sum()} tgt / {len(truth) - truth.sum()} non)")
  return {"eer": float(eer), "mindcf": float(mindcf)}


if __name__ == "__main__":
  main()
