"""Round-2 topic-model TPU run: amortized LDA on a 20k-document synthetic
LDA corpus with known ground-truth topics (dense nets -> ~20 s compile,
unlike the 15-min conv VAEs).

Records: training throughput, held-out perplexity, and topic recovery
(match learned topic-word rows to the generating topics by greedy cosine
assignment).  Reference behavior: ``odin/bay/vi/autoencoder/lda_vae.py``.

Run (on the TPU chip):  python results/lda/run_r2_lda_tpu.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from odin_tpu.bay.vi.autoencoder import amortizedLDA
from odin_tpu.fuel import SyntheticBoW

OUT = os.path.dirname(os.path.abspath(__file__))
STEPS = 10_000
BATCH = 256
N_TOPICS = 10


def main():
  ds = SyntheticBoW(n_docs=20_000, n_words=500, n_topics=N_TOPICS,
                    doc_length=120, seed=1)
  x_train, _ = ds.numpy("train")
  x_test, _ = ds.numpy("test")
  print(f"corpus: train {x_train.shape}, test {x_test.shape}", flush=True)

  lda = amortizedLDA(n_words=500, n_topics=N_TOPICS).build(seed=1)
  t0 = time.time()
  lda.fit_device_dataset(x_train.astype("float32"), n_steps=STEPS,
                         batch_size=BATCH, learning_rate=1e-3,
                         steps_per_call=200, seed=1)
  dt = time.time() - t0
  rate = STEPS / dt
  print(f"trained {STEPS} steps in {dt:.0f}s ({rate:.0f} steps/s)",
        flush=True)

  ppl = lda.perplexity(x_test[:2000])
  # topic recovery: cosine-match learned word distributions to true topics
  _, learned = lda.get_topics()
  true = ds.topics  # (K, V)
  ln = learned / np.linalg.norm(learned, axis=1, keepdims=True)
  tn = true / np.linalg.norm(true, axis=1, keepdims=True)
  sim = tn @ ln.T  # (K_true, K_learned)
  from odin_tpu.search import search_assignment
  cols = search_assignment(sim)  # Hungarian, maximize
  matched = float(sim[np.arange(sim.shape[0]), cols].mean())

  rep = {"steps": STEPS, "batch": BATCH, "steps_per_sec": round(rate, 1),
         "docs_per_sec": round(rate * BATCH, 0),
         "test_perplexity": round(float(ppl), 2),
         "mean_matched_topic_cosine": round(matched, 4)}
  with open(os.path.join(OUT, "lda_tpu_10k.json"), "w") as f:
    json.dump(rep, f, indent=1)
  print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
