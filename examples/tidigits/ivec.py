"""i-vector speaker recognition recipe (reference: ``examples/tidigits/ivec.py``
and ``examples/fsdd_ivec.py:80-106``): feature pipeline -> GMM-UBM ->
T-matrix -> i-vectors -> cosine scoring -> EER.

Without TIDIGITS on disk this runs on synthetic multi-speaker audio
(f0 + formant structure per speaker) so the whole recipe is exercised
offline::

  python examples/tidigits/ivec.py nmix=16 tv_dim=32
"""
import numpy as np

from odin_tpu.backend import compute_EER, compute_minDCF, det_curve
from odin_tpu.ml import Ivector, PLDA, Scorer
from odin_tpu.ops.features import FeatureConfig
from odin_tpu.preprocessing import batch_speech_features
from odin_tpu.training import run_hydra

CONFIG = dict(n_speakers=8, n_utt=12, nmix=16, tv_dim=32, n_mels=24,
              n_ceps=14, train_frac=0.6)


def synth_speaker_audio(n_speakers, n_utt, seed=0, sr=16000, dur=1.0):
  rng = np.random.RandomState(seed)
  f0s = rng.uniform(90, 280, n_speakers)
  formants = rng.uniform(400, 2800, (n_speakers, 3))
  utts, labels = [], []
  t = np.arange(int(sr * dur)) / sr
  for s in range(n_speakers):
    for u in range(n_utt):
      r = np.random.RandomState(seed + s * 1000 + u)
      y = 0.4 * np.sin(2 * np.pi * f0s[s] * t * (1 + 0.02 * r.randn()))
      for f in formants[s]:
        y += 0.15 * np.sin(2 * np.pi * f * t * (1 + 0.02 * r.randn()))
      utts.append((y + 0.05 * r.randn(len(t))).astype("f"))
      labels.append(s)
  return utts, np.asarray(labels)


@run_hydra(output_dir="./results/ivec", config=CONFIG)
def main(cfg):
  utts, labels = synth_speaker_audio(cfg.n_speakers, cfg.n_utt)
  feats = batch_speech_features(
      utts, FeatureConfig(n_mels=cfg.n_mels, n_ceps=cfg.n_ceps),
      features=("mfcc_cmvn",))
  feat_mats = [f["mfcc_cmvn"] for f in feats]
  ivec = Ivector(path=cfg.output_dir, nmix=cfg.nmix, tv_dim=cfg.tv_dim)
  vecs = ivec.fit_transform(feat_mats, verbose=True)
  tr = np.arange(len(labels)) % cfg.n_utt < int(cfg.train_frac * cfg.n_utt)
  scorer = Scorer(method="cosine", wccn=True).fit(vecs[tr], labels[tr])
  scores = scorer.score(vecs[~tr])
  truth = (labels[~tr][:, None] == scorer.labels[None, :]).astype(int)
  Pfa, Pmiss, _ = det_curve(truth.ravel(), scores.ravel())
  eer = compute_EER(Pfa, Pmiss)
  mindcf, _ = compute_minDCF(Pfa, Pmiss)
  acc = float(np.mean(scorer.predict(vecs[~tr]) == labels[~tr]))
  print(f"cosine: EER={eer:.4f} minDCF={mindcf:.4f} closed-set acc={acc:.3f}")
  plda = PLDA(n_phi=min(cfg.tv_dim // 2, 16), n_iter=8).fit(vecs[tr],
                                                            labels[tr])
  acc_plda = float(np.mean(plda.predict(vecs[~tr]) == labels[~tr]))
  print(f"plda: closed-set acc={acc_plda:.3f}")
  return dict(eer=eer, mindcf=mindcf, acc=acc, acc_plda=acc_plda)


if __name__ == "__main__":
  main()
