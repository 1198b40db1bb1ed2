"""LDA-family comparison (reference ``examples/vae/vae_lda_test.py``):
train every topic-model variant (amortizedLDA, nonlinearLDA, auxiliaryLDA,
ALDA) on the same synthetic bag-of-words corpus and compare held-out
perplexity and topic recovery.

Run: ``python examples/vae/vae_lda_test.py max_iter=2000``
"""
import numpy as np

from odin_tpu.bay.vi import ALDA, amortizedLDA, auxiliaryLDA, nonlinearLDA
from odin_tpu.fuel import SyntheticBoW
from odin_tpu.training import run_hydra

CONFIG = dict(n_docs=2000, n_words=200, n_topics=8, max_iter=2000, lr=1e-3)


def topic_match(lda, true_topics) -> float:
  """Mean best-match cosine between learned and true topic-word rows."""
  _, probs = lda.get_topics(top_k=10)
  sims = probs @ true_topics.T
  sims = sims / (np.linalg.norm(probs, axis=1, keepdims=True) *
                 np.linalg.norm(true_topics, axis=1)[None] + 1e-9)
  return float(sims.max(axis=1).mean())


@run_hydra(output_dir="./results/lda_family", config=CONFIG)
def main(cfg):
  ds = SyntheticBoW(n_docs=cfg.n_docs, n_words=cfg.n_words,
                    n_topics=cfg.n_topics)
  x_test, y_test = ds.numpy("test")
  results = {}
  for cls in (amortizedLDA, nonlinearLDA, auxiliaryLDA, ALDA):
    kwargs = dict(n_words=cfg.n_words, n_topics=cfg.n_topics)
    if cls is auxiliaryLDA:
      kwargs["n_labels"] = int(np.asarray(y_test).max()) + 1 \
          if y_test is not None else cfg.n_topics
    lda = cls(**kwargs).build()
    train = ds.create_dataset(
        "train", batch_size=64, epochs=-1,
        inc_labels=cls.is_semi_supervised())
    lda.fit(train, max_iter=cfg.max_iter, learning_rate=cfg.lr,
            verbose=False)
    ppl = lda.perplexity(x_test)
    match = topic_match(lda, ds.topics)
    results[cls.__name__] = dict(perplexity=float(ppl), topic_match=match)
    print(f"{cls.__name__:14s}: perplexity={ppl:8.2f} "
          f"topic-match={match:.3f}")
  return results


if __name__ == "__main__":
  main()
