"""Open-set (disjoint-speaker) i-vector vs x-vector verification study.

VERDICT r4 weak #2: the crossover study's EERs are CLOSED-SET — every trial
speaker's identity was a training class of the TDNN softmax, while the
i-vector front-end is unsupervised, a protocol that structurally favors the
discriminative model.  Published x-vector-vs-i-vector comparisons (and the
reference's own nist_sre/voxceleb recipes, ``odin/fuel/__init__.py``
`load_sre_list`/`load_voxceleb_list`) score trials over speakers NEVER seen
in embedding training.  This study reruns both backends under that
protocol:

  * speakers split DISJOINTLY: the first `train_frac` of speakers train the
    front-ends (TDNN softmax classes; i-vector UBM+T statistics) and the
    backends (WCCN / PLDA, with labels — standard practice), the held-out
    speakers are never seen by any trained component;
  * each held-out speaker enrolls with the average of `n_enroll` utterance
    embeddings; every remaining held-out utterance is a test segment;
  * the full model x segment trial grid is scored by cosine (after
    center/WCCN/length-norm learned on the train speakers) and by PLDA
    verification LLR (`PLDA.score_matrix`), EER over target/nontarget
    trials.

Reference bar: ``odin/networks/time_delay.py:39-319`` + the disjoint-trial
recipe intent of ``examples/nist_sre``.  Results land next to the closed-set
rows in results/xvec/ so the two protocols can be read side by side.

Run:  python examples/tidigits/crossover_openset.py [--scale L]
"""
import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from odin_tpu.backend import compute_EER, det_curve
from odin_tpu.fuel.audio_data import synth_speaker_corpus
from odin_tpu.ml import Ivector, PLDA
from odin_tpu.ml.scoring import VectorNormalizer
from odin_tpu.ops.features import FeatureConfig
from odin_tpu.preprocessing import batch_speech_features

_spec = importlib.util.spec_from_file_location(
    "crossover_study",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "crossover_study.py"))
_cs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cs)

OUT = _cs.OUT
SCALES = _cs.SCALES
N_ENROLL = 5
TRAIN_SPK_FRAC = 0.75


def _trial_eer(scores: np.ndarray, truth: np.ndarray) -> float:
  Pfa, Pmiss, _ = det_curve(truth.ravel(), scores.ravel())
  return float(compute_EER(Pfa, Pmiss))


def verification_eers(vec, labels, spk_tr, spk_ev, rng):
  """(cosine EER, PLDA EER) over the held-out-speaker trial grid.

  Backends (center/WCCN/length-norm; PLDA) are fitted on the TRAIN
  speakers' vectors+labels only; enroll/test segments both come from the
  held-out speakers."""
  in_tr = np.isin(labels, spk_tr)
  norm = VectorNormalizer(centering=True, wccn=True, unit_length=True)
  norm.fit(vec[in_tr], labels[in_tr])
  v = norm.transform(vec)

  n_phi = min(max(vec.shape[1] // 2, 4), 64)
  plda = PLDA(n_phi=n_phi, n_iter=8).fit(vec[in_tr], labels[in_tr])

  enroll_cos, enroll_raw, test_idx = [], [], []
  for s in spk_ev:
    idx = np.where(labels == s)[0]
    idx = rng.permutation(idx)
    e, t = idx[:N_ENROLL], idx[N_ENROLL:]
    c = v[e].mean(0)
    enroll_cos.append(c / max(np.linalg.norm(c), 1e-12))
    enroll_raw.append(vec[e].mean(0))
    test_idx.append(t)
  enroll_cos = np.stack(enroll_cos)           # (S, D) normalized
  enroll_raw = np.stack(enroll_raw)           # (S, D) raw for PLDA
  test = np.concatenate(test_idx)             # (N,)
  truth = (labels[test][None, :] == np.asarray(spk_ev)[:, None]).astype(int)

  sc_cos = enroll_cos @ v[test].T             # (S, N)
  sc_plda = plda.score_matrix(enroll_raw, vec[test])
  return (_trial_eer(sc_cos, truth), _trial_eer(sc_plda, truth),
          int(truth.sum()), int(truth.size - truth.sum()))


def run_scale(tag, cfg, seed=0):
  t0 = time.time()
  utts, labels = synth_speaker_corpus(cfg["n_speakers"], cfg["n_utt"],
                                      seed=seed)
  labels = np.asarray(labels)
  feats = batch_speech_features(utts, FeatureConfig(n_mels=24, n_ceps=14),
                                features=("mfcc_cmvn",))
  X = np.stack([f["mfcc_cmvn"] for f in feats]).astype(np.float32)
  n_spk = cfg["n_speakers"]
  n_tr_spk = int(round(TRAIN_SPK_FRAC * n_spk))
  rng = np.random.RandomState(7)
  order = rng.permutation(n_spk)
  spk_tr, spk_ev = np.sort(order[:n_tr_spk]), np.sort(order[n_tr_spk:])
  in_tr = np.isin(labels, spk_tr)
  print(f"[{tag}] corpus {X.shape} in {time.time() - t0:.0f}s; "
        f"{n_tr_spk} train / {len(spk_ev)} held-out speakers", flush=True)

  # --- i-vector front-end: UBM+T on train-speaker utterances only
  t0 = time.time()
  ivec = Ivector(path=os.path.join(OUT, f"ivec_open_{tag}"),
                 nmix=cfg["nmix"], tv_dim=cfg["tv_dim"])
  ivec.fit([x for x in X[in_tr]], verbose=False)
  vec_iv = ivec.transform([x for x in X])
  iv = verification_eers(vec_iv, labels, spk_tr, spk_ev,
                         np.random.RandomState(13))
  t_iv = time.time() - t0
  print(f"[{tag}] ivec open-set: cosEER={iv[0]:.3f} pldaEER={iv[1]:.3f} "
        f"({iv[2]} tgt/{iv[3]} non trials, {t_iv:.0f}s)", flush=True)

  # --- x-vector front-end: softmax over the TRAIN speakers only
  t0 = time.time()
  remap = -np.ones(n_spk, np.int64)
  remap[spk_tr] = np.arange(n_tr_spk)
  emb = _cs.train_xvector(X[in_tr], remap[labels[in_tr]], X,
                          n_classes=n_tr_spk, steps=cfg["steps"],
                          batch=cfg.get("batch", _cs.BATCH))
  xv = verification_eers(emb, labels, spk_tr, spk_ev,
                         np.random.RandomState(13))
  t_xv = time.time() - t0
  print(f"[{tag}] xvec open-set: cosEER={xv[0]:.3f} pldaEER={xv[1]:.3f} "
        f"({t_xv:.0f}s)", flush=True)
  return dict(
      scale=tag, protocol="open-set verification (disjoint speakers)",
      n_speakers=n_spk, n_utt=cfg["n_utt"],
      n_train_speakers=n_tr_spk, n_eval_speakers=len(spk_ev),
      n_enroll=N_ENROLL, n_target_trials=iv[2], n_nontarget_trials=iv[3],
      ivec=dict(eer_cosine=iv[0], eer_plda=iv[1], wallclock_sec=round(t_iv)),
      xvec=dict(eer_cosine=xv[0], eer_plda=xv[1], wallclock_sec=round(t_xv),
                steps=cfg["steps"]))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--scale", choices=list(SCALES) + ["all"], default="all")
  args = ap.parse_args()
  os.makedirs(OUT, exist_ok=True)
  path = os.path.join(OUT, "crossover_openset.json")
  rows = json.load(open(path)) if os.path.exists(path) else []
  tags = ["M", "L"] if args.scale == "all" else [args.scale]
  for tag in tags:
    if any(r.get("scale") == tag for r in rows):
      print(f"[{tag}] already recorded", flush=True)
      continue
    row = run_scale(tag, SCALES[tag])
    rows = [r for r in rows if r.get("scale") != tag] + [row]
    with open(path, "w") as f:
      json.dump(rows, f, indent=1)
  print(json.dumps(rows))


if __name__ == "__main__":
  main()
