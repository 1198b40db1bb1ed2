"""i-vector vs x-vector crossover study (VERDICT r3 weak #2).

Round-3 recorded the TDNN x-vector only ever LOSING (0.450 closed-set acc
vs 0.833 i-vector at 12 speakers x 16 utterances) with "needs more data" as
an untested explanation.  This study scales the phoneme-structured
synthetic corpus (`odin_tpu.fuel.audio_data.synth_speaker_corpus`) across
three sizes and records EER + closed-set accuracy for BOTH backends with
BOTH scorers (cosine/WCCN and PLDA — the r3 table's missing PLDA EER), so
the generative-vs-discriminative crossover is measured, not asserted.

Reference bar: ``odin/networks/time_delay.py:39-319`` (TDNN blocks) and the
nist_sre/voxceleb recipe intent (``examples/``).

Run:  python examples/tidigits/crossover_study.py          (~all scales)
      python examples/tidigits/crossover_study.py --scale S
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import optax

from odin_tpu.backend import compute_EER, det_curve
from odin_tpu.fuel.audio_data import synth_speaker_corpus
from odin_tpu.ml import Ivector, PLDA, Scorer
from odin_tpu.networks.time_delay import XVectorNet
from odin_tpu.ops.features import FeatureConfig
from odin_tpu.preprocessing import batch_speech_features
from odin_tpu.training import TrainState
from odin_tpu.training.core import device_dataset_steps

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                   "results", "xvec")

SCALES = {
    # "T" is a CPU-runnable wiring smoke, not a recorded scale
    "T": dict(n_speakers=6, n_utt=6, nmix=4, tv_dim=8, steps=10,
              batch=8),
    "S": dict(n_speakers=12, n_utt=16, nmix=16, tv_dim=32, steps=2_000),
    "M": dict(n_speakers=32, n_utt=32, nmix=32, tv_dim=64, steps=6_000),
    "L": dict(n_speakers=64, n_utt=50, nmix=64, tv_dim=100, steps=12_000),
}
TRAIN_FRAC = 0.7
EMB_DIM = 128
BATCH = 64


def _eer_acc(vec_tr, y_tr, vec_te, y_te):
  """(cosine EER, cosine acc, PLDA EER, PLDA acc) for one embedding set."""
  scorer = Scorer(method="cosine", wccn=True).fit(vec_tr, y_tr)
  sc = scorer.score(vec_te)
  truth = (y_te[:, None] == scorer.labels[None, :]).astype(int)
  Pfa, Pmiss, _ = det_curve(truth.ravel(), sc.ravel())
  eer_cos = float(compute_EER(Pfa, Pmiss))
  acc_cos = float(np.mean(scorer.predict(vec_te) == y_te))
  n_phi = min(max(vec_tr.shape[1] // 2, 4), 64)
  plda = PLDA(n_phi=n_phi, n_iter=8).fit(vec_tr, y_tr)
  lp = plda.predict_log_proba(vec_te)
  truth_p = (y_te[:, None] ==
             np.arange(lp.shape[1])[None, :]).astype(int)
  Pfa, Pmiss, _ = det_curve(truth_p.ravel(), lp.ravel())
  eer_plda = float(compute_EER(Pfa, Pmiss))
  acc_plda = float(np.mean(np.argmax(lp, 1) == y_te))
  return eer_cos, acc_cos, eer_plda, acc_plda


def train_xvector(X, y, X_all, n_classes, steps, seed=0,
                  batch=BATCH):
  """Fused on-device training: corpus resident in HBM, batches sampled +
  SpecAugment-masked inside the compiled scan (no per-step host traffic).
  Trains on (X, y), returns embeddings for every row of `X_all`."""
  net = XVectorNet(n_classes=n_classes, embedding_dim=EMB_DIM)
  rng = jax.random.PRNGKey(seed)
  params = net.init(rng, jnp.asarray(X[:1]))["params"]
  opt = optax.adamw(optax.exponential_decay(1e-3, 2_000, 0.7),
                    weight_decay=1e-4)
  state = TrainState(params={"net": params},
                     opt_states={"net": opt.init(params)},
                     step=jnp.zeros((), jnp.int32), rng=rng)
  T = X.shape[1]

  def step_fn(state, xy):
    xb, yb = xy

    def loss_fn(p):
      logits = net.apply({"params": p}, xb, training=True)
      return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(batch), yb])

    loss, grads = jax.value_and_grad(loss_fn)(state.params["net"])
    updates, new_opt = opt.update(grads, state.opt_states["net"],
                                  state.params["net"])
    return state.replace(
        params={"net": optax.apply_updates(state.params["net"], updates)},
        opt_states={"net": new_opt}, step=state.step + 1), {"loss": loss}

  def sample_fn(key, data):
    Xd, yd = data
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jax.random.randint(k1, (batch,), 0, Xd.shape[0])
    xb, yb = Xd[idx], yd[idx]
    # SpecAugment-lite inside the graph: zero one random time span per row
    w = jax.random.randint(k2, (batch, 1), 0, T // 4)
    s = (jax.random.uniform(k3, (batch, 1)) * (T - w)).astype(jnp.int32)
    pos = jnp.arange(T)[None, :]
    mask = (pos >= s) & (pos < s + w)
    return xb * (1.0 - mask[..., None].astype(xb.dtype)), yb

  k = min(1000, steps)
  fused = jax.jit(device_dataset_steps(step_fn, batch, k,
                                       seed=seed, sample_fn=sample_fn),
                  donate_argnums=(0,))
  data = (jnp.asarray(X), jnp.asarray(y))
  done, t0 = 0, time.time()
  while done < steps:
    state, metrics = fused(state, data)
    done += k
    print(f"  [xvec] #{done} loss={float(metrics['loss']):.4f} "
          f"({done / (time.time() - t0):.0f} steps/s)", flush=True)
  params_final = jax.device_get(state.params["net"])

  emb_fn = jax.jit(lambda xb: net.apply({"params": params_final}, xb,
                                        return_embedding=True))
  embs = []
  for i in range(0, len(X_all), 256):
    xb = X_all[i:i + 256]
    n = len(xb)
    if n < 256:
      xb = np.concatenate([xb, np.zeros((256 - n,) + xb.shape[1:],
                                        xb.dtype)])
    embs.append(np.asarray(emb_fn(jnp.asarray(xb)))[:n])
  return np.concatenate(embs)


def run_scale(tag, cfg):
  t0 = time.time()
  utts, labels = synth_speaker_corpus(cfg["n_speakers"], cfg["n_utt"],
                                      seed=0)
  feats = batch_speech_features(utts, FeatureConfig(n_mels=24, n_ceps=14),
                                features=("mfcc_cmvn",))
  X = np.stack([f["mfcc_cmvn"] for f in feats]).astype(np.float32)
  tr = np.arange(len(labels)) % cfg["n_utt"] < int(TRAIN_FRAC * cfg["n_utt"])
  print(f"[{tag}] corpus {X.shape} extracted in {time.time() - t0:.0f}s",
        flush=True)

  # --- i-vector backend
  t0 = time.time()
  ivec = Ivector(path=os.path.join(OUT, f"ivec_{tag}"),
                 nmix=cfg["nmix"], tv_dim=cfg["tv_dim"])
  vecs = ivec.fit_transform([x for x in X], verbose=False)
  iv = _eer_acc(vecs[tr], labels[tr], vecs[~tr], labels[~tr])
  t_iv = time.time() - t0
  print(f"[{tag}] ivec: cosEER={iv[0]:.3f} cosAcc={iv[1]:.3f} "
        f"pldaEER={iv[2]:.3f} pldaAcc={iv[3]:.3f} ({t_iv:.0f}s)", flush=True)

  # --- x-vector backend (trained on train utterances only)
  t0 = time.time()
  emb = train_xvector(X[tr], labels[tr], X, n_classes=cfg["n_speakers"],
                      steps=cfg["steps"], batch=cfg.get("batch", BATCH))
  xv = _eer_acc(emb[tr], labels[tr], emb[~tr], labels[~tr])
  t_xv = time.time() - t0
  print(f"[{tag}] xvec: cosEER={xv[0]:.3f} cosAcc={xv[1]:.3f} "
        f"pldaEER={xv[2]:.3f} pldaAcc={xv[3]:.3f} ({t_xv:.0f}s)", flush=True)
  return dict(scale=tag, n_speakers=cfg["n_speakers"], n_utt=cfg["n_utt"],
              ivec=dict(eer_cosine=iv[0], acc_cosine=iv[1],
                        eer_plda=iv[2], acc_plda=iv[3],
                        wallclock_sec=round(t_iv)),
              xvec=dict(eer_cosine=xv[0], acc_cosine=xv[1],
                        eer_plda=xv[2], acc_plda=xv[3],
                        wallclock_sec=round(t_xv), steps=cfg["steps"]))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--scale", choices=list(SCALES) + ["all"], default="all")
  args = ap.parse_args()
  os.makedirs(OUT, exist_ok=True)
  path = os.path.join(OUT, "crossover.json")
  # merge with previously recorded scales: the queue runs one scale per
  # invocation, so overwriting with only this invocation's rows would
  # clobber earlier results (and re-trigger their done-checks)
  rows = json.load(open(path)) if os.path.exists(path) else []
  tags = [t for t in SCALES if t != "T"] if args.scale == "all" \
      else [args.scale]
  for tag in tags:
    row = run_scale(tag, SCALES[tag])
    rows = [r for r in rows if r.get("scale") != tag] + [row]
    with open(path, "w") as f:
      json.dump(rows, f, indent=1)
  print(json.dumps(rows))


if __name__ == "__main__":
  main()
