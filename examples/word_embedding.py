"""Train word embeddings with a mean-pooled classifier and inspect nearest
neighbors (reference: ``examples/word_embbeding.py``, which loads GloVe +
20newsgroups through the legacy `odin.nnet` stack).

No-egress rebuild: a procedural topic corpus (each document samples words
from one of K topic unigram distributions over a shared vocabulary) stands
in for newsgroups; the `preprocessing.text.Tokenizer` builds the vocab, and
ONE jitted train step learns `nn.Embed` + classifier end-to-end.  Topic
structure is verified by checking that nearest neighbors of a topic's cue
words stay within the topic.
"""
import numpy as np

CONFIG = dict(n_topics=4, vocab=240, doc_len=24, n_docs=2048,
              embedding_dim=32, steps=600, lr=3e-3)

TOPIC_CUES = ["engine", "wheel", "road", "planet", "orbit", "star",
              "guitar", "drum", "melody", "serve", "goal", "score"]


def make_corpus(cfg, rng):
  """Documents = draws from one topic's word list (cues included), with a
  15% background mix over the whole vocabulary."""
  k = cfg["n_topics"]
  per = cfg["vocab"] // k
  alpha = "abcdefghijklmnopqrstuvwxyz"

  def alpha_word(t, i):  # all-alphabetic so the tokenizer keeps it whole
    return alpha[t] + "q" + alpha[i // 26] + alpha[i % 26]

  topic_words = [TOPIC_CUES[t * 3:(t + 1) * 3] +
                 [alpha_word(t, i) for i in range(per - 3)]
                 for t in range(k)]
  words = [w for tw in topic_words for w in tw]
  docs, labels = [], []
  for d in range(cfg["n_docs"]):
    topic = d % k
    own, cues = topic_words[topic], TOPIC_CUES[topic * 3:(topic + 1) * 3]
    toks = []
    for _ in range(cfg["doc_len"]):
      r = rng.rand()
      if r < 0.3:
        toks.append(cues[rng.randint(len(cues))])
      elif r < 0.85:
        toks.append(own[rng.randint(len(own))])
      else:
        toks.append(words[rng.randint(len(words))])
    docs.append(" ".join(toks))
    labels.append(topic)
  return docs, np.asarray(labels, np.int32), words


def main(cfg=None):
  cfg = {**CONFIG, **(cfg or {})}
  import matplotlib
  matplotlib.use("Agg")
  import jax
  import jax.numpy as jnp
  import optax
  import flax.linen as nn

  from odin_tpu.preprocessing.text import Tokenizer
  from odin_tpu import visual as V

  rng = np.random.RandomState(5218)
  docs, labels, _ = make_corpus(cfg, rng)
  tk = Tokenizer(n_words=cfg["vocab"] + 2).fit(docs)
  X = tk.transform(docs, maxlen=cfg["doc_len"], mode="seq")
  print("corpus:", X.shape, "vocab:", tk.vocab_size)

  class EmbedClassifier(nn.Module):
    vocab: int
    dim: int
    n_classes: int

    @nn.compact
    def __call__(self, ids):
      emb = nn.Embed(self.vocab, self.dim, name="embedding")(ids)
      mask = (ids != 0)[..., None].astype(jnp.float32)
      pooled = (emb * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
      h = nn.relu(nn.Dense(64)(pooled))
      return nn.Dense(self.n_classes)(h)

  model = EmbedClassifier(tk.vocab_size, cfg["embedding_dim"],
                          cfg["n_topics"])
  params = model.init(jax.random.PRNGKey(0), jnp.asarray(X[:2]))
  opt = optax.adam(cfg["lr"])
  opt_state = opt.init(params)

  def loss_fn(p, ids, y):
    logits = model.apply(p, ids)
    return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

  @jax.jit
  def step(p, s, ids, y):
    loss, g = jax.value_and_grad(loss_fn)(p, ids, y)
    updates, s = opt.update(g, s)
    return optax.apply_updates(p, updates), s, loss

  ids_all, y_all = jnp.asarray(X), jnp.asarray(labels)
  n = len(X)
  for i in range(cfg["steps"]):
    sel = rng.randint(0, n, 128)
    params, opt_state, loss = step(params, opt_state, ids_all[sel],
                                   y_all[sel])
    if (i + 1) % 200 == 0:
      print(f"step {i + 1}: loss {float(loss):.4f}")

  # nearest neighbors of the cue words must be same-topic
  _, _, words = make_corpus({**cfg, "n_docs": 0}, np.random.RandomState(0))
  per = len(words) // cfg["n_topics"]
  word_topic = {w: i // per for i, w in enumerate(words)}
  emb = np.asarray(params["params"]["embedding"]["embedding"])
  emb_n = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)
  hits = total = 0
  for topic in range(cfg["n_topics"]):
    for cue in TOPIC_CUES[topic * 3:(topic + 1) * 3]:
      i = tk.word_index[cue]
      sims = emb_n @ emb_n[i]
      sims[i] = -np.inf
      near_word = tk.index_word[int(np.argmax(sims))]
      same = word_topic.get(near_word) == topic
      print(f"  {cue:8s} -> {near_word}  {'(same topic)' if same else ''}")
      hits += int(same)
      total += 1
  print(f"nearest-neighbor topic purity: {hits}/{total}")
  # visual check: 2-D PCA of the cue-word embeddings colored by topic
  from odin_tpu.ml import fast_pca
  cue_ids = [tk.word_index[w] for w in TOPIC_CUES]
  p2 = fast_pca(emb[cue_ids], n_components=2)
  ax = V.to_axis(None)
  for topic in range(cfg["n_topics"]):
    sl = slice(topic * 3, (topic + 1) * 3)
    ax.scatter(p2[sl, 0], p2[sl, 1], label=f"topic {topic}", s=60)
    for j in range(topic * 3, (topic + 1) * 3):
      ax.annotate(TOPIC_CUES[j], p2[j])
  ax.legend()
  path = V.plot_save("/tmp/word_embedding.pdf")
  print("figure:", path or "/tmp/word_embedding.pdf")


if __name__ == "__main__":
  main()
