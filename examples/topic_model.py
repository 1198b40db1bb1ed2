"""Amortized LDA topic modelling (reference: the LDA family of
``odin/bay/vi/autoencoder/lda_vae.py`` used in nlp examples).

Run: ``python examples/topic_model.py n_topics=8 max_iter=2000``
"""
import numpy as np

from odin_tpu.bay.vi import amortizedLDA
from odin_tpu.fuel import SyntheticBoW
from odin_tpu.training import run_hydra

CONFIG = dict(n_docs=2000, n_words=200, n_topics=8, max_iter=2000, lr=1e-3)


@run_hydra(output_dir="./results/lda", config=CONFIG)
def main(cfg):
  ds = SyntheticBoW(n_docs=cfg.n_docs, n_words=cfg.n_words,
                    n_topics=cfg.n_topics)
  lda = amortizedLDA(n_words=cfg.n_words, n_topics=cfg.n_topics).build()
  train = ds.create_dataset("train", batch_size=64, epochs=-1)
  lda.fit(train, max_iter=cfg.max_iter, learning_rate=cfg.lr,
          logdir=cfg.output_dir)
  x_test, _ = ds.numpy("test")
  ppl = lda.perplexity(x_test)
  # recovered topics vs true topics: best-match cosine
  idx, probs = lda.get_topics(top_k=10)
  sims = probs @ ds.topics.T
  sims = sims / (np.linalg.norm(probs, axis=1, keepdims=True) *
                 np.linalg.norm(ds.topics, axis=1)[None] + 1e-9)
  match = sims.max(axis=1)
  print(f"test perplexity={ppl:.2f}; topic best-match cosine: "
        f"mean={match.mean():.3f}")
  return dict(perplexity=ppl, topic_match=float(match.mean()))


if __name__ == "__main__":
  main()
