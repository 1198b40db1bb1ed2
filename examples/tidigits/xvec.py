"""x-vector speaker embedding recipe (reference: ``examples/tidigits/xvec.py``):
TDNN encoder + stats pooling trained as a speaker classifier; embeddings
scored with cosine.

Run: ``python examples/tidigits/xvec.py max_iter=600``
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from odin_tpu import parallel
from odin_tpu.ml import Scorer
from odin_tpu.networks.time_delay import XVectorNet
from odin_tpu.ops.features import FeatureConfig
from odin_tpu.preprocessing import batch_speech_features
from odin_tpu.training import Trainer, TrainState, run_hydra

CONFIG = dict(n_speakers=8, n_utt=12, max_iter=600, lr=1e-3, batch_size=16,
              embedding_dim=64)


def main_impl(cfg):
  import sys
  sys.path.insert(0, "examples/tidigits")
  from ivec import synth_speaker_audio
  utts, labels = synth_speaker_audio(cfg.n_speakers, cfg.n_utt)
  feats = batch_speech_features(utts, FeatureConfig(n_mels=24, n_ceps=14),
                                features=("mfcc_cmvn",))
  X = np.stack([f["mfcc_cmvn"] for f in feats])  # (N, T, F) equal lengths
  net = XVectorNet(n_classes=cfg.n_speakers, embedding_dim=cfg.embedding_dim)
  rng = jax.random.PRNGKey(0)
  params = net.init(rng, jnp.asarray(X[:1]))["params"]
  opt = optax.adamw(cfg.lr, weight_decay=1e-4)
  state = TrainState(params={"net": params},
                     opt_states={"net": opt.init(params)},
                     step=jnp.zeros((), jnp.int32), rng=rng)

  def loss_fn(params, batch):
    x, y = batch
    logits = net.apply({"params": params}, x, training=True)
    return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(len(y)), y])

  @jax.jit
  def step_fn(state, batch):
    loss, grads = jax.value_and_grad(loss_fn)(state.params["net"], batch)
    updates, new_opt = opt.update(grads, state.opt_states["net"],
                                  state.params["net"])
    new_params = optax.apply_updates(state.params["net"], updates)
    new_state = state.replace(params={"net": new_params},
                              opt_states={"net": new_opt},
                              step=state.step + 1)
    return new_state, {"loss": loss}

  n_train_utt = max(1, int(0.7 * cfg.n_utt))
  tr_idx = np.arange(len(labels)) % cfg.n_utt < n_train_utt
  Xtr, ytr = X[tr_idx], labels[tr_idx]

  def batches(n):
    # SpecAugment-lite: mask a random time span per utterance — with only
    # ~a dozen train utterances per speaker the TDNN memorizes otherwise
    r = np.random.RandomState(0)
    T = Xtr.shape[1]
    for _ in range(n):
      i = r.randint(0, len(Xtr), cfg.batch_size)
      xb = Xtr[i].copy()
      for b in range(len(xb)):
        w = r.randint(0, T // 4)
        s = r.randint(0, T - w) if w else 0
        xb[b, s:s + w] = 0.0
      yield (xb, ytr[i])

  trainer = Trainer(logdir=cfg.output_dir)
  state = trainer.fit(batches(cfg.max_iter), step_fn, state,
                      max_iter=cfg.max_iter)
  # extract embeddings, score held-out utterances
  params_final = jax.device_get(state.params["net"])
  emb = np.asarray(net.apply({"params": params_final}, jnp.asarray(X),
                             return_embedding=True))
  scorer = Scorer(method="cosine", wccn=True).fit(emb[tr_idx], labels[tr_idx])
  acc = float(np.mean(scorer.predict(emb[~tr_idx]) == labels[~tr_idx]))
  print(f"x-vector cosine closed-set acc={acc:.3f}")
  return acc


@run_hydra(output_dir="./results/xvec", config=CONFIG)
def main(cfg):
  return main_impl(cfg)


if __name__ == "__main__":
  main()
