"""NLP datasets (reference: ``odin/fuel/nlp_data/``).

`Newsgroup20` / `Newsgroup5` TF-IDF (reference ``newsgroup.py:12,86``) use
sklearn's cached copy when available (no egress here).  `SyntheticBoW`
generates LDA-style bag-of-words corpora for topic-model tests.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from odin_tpu.fuel.dataset_base import IterableDataset, get_partition

__all__ = ["NLPDataset", "Newsgroup20", "Newsgroup5",
           "Newsgroup20_clean", "SyntheticBoW",
           "MathArithmetic", "TinyShakespear", "ImdbReview"]


class NLPDataset(IterableDataset):

  @property
  def data_type(self):
    return "text"


class Newsgroup20(NLPDataset):
  """20-newsgroups as TF-IDF vectors (reference ``newsgroup.py:12``)."""

  def __init__(self, n_words: int = 1000, seed: int = 1):
    super().__init__(seed=seed)
    self.n_words = int(n_words)
    self._cache = None

  @property
  def name(self):
    return "newsgroup20"

  @property
  def shape(self):
    return (self.n_words,)

  @property
  def labels(self):
    return [str(i) for i in range(20)]

  def _fetch(self):
    if self._cache is None:
      from sklearn.datasets import fetch_20newsgroups
      from sklearn.feature_extraction.text import TfidfVectorizer
      try:
        train = fetch_20newsgroups(subset="train", download_if_missing=False)
        test = fetch_20newsgroups(subset="test", download_if_missing=False)
      except Exception as e:
        raise FileNotFoundError(
            "20newsgroups is not cached locally and this environment has no "
            "network egress; use SyntheticBoW for testing") from e
      vec = TfidfVectorizer(max_features=self.n_words, stop_words="english")
      x_train = vec.fit_transform(train.data).toarray().astype("float32")
      x_test = vec.transform(test.data).toarray().astype("float32")
      self._cache = (x_train, np.asarray(train.target),
                     x_test, np.asarray(test.target))
    return self._cache

  def _load(self, partition: str):
    x_train, y_train, x_test, y_test = self._fetch()
    n = len(x_train)
    k = int(0.9 * n)
    return get_partition(partition,
                         train=(x_train[:k], y_train[:k]),
                         valid=(x_train[k:], y_train[k:]),
                         test=(x_test, y_test))


class Newsgroup5(Newsgroup20):
  """5 superclasses of 20-newsgroups (reference ``newsgroup.py:86``)."""

  _GROUPS = {0: [0, 15, 19], 1: [1, 2, 3, 4, 5], 2: [6, 7, 8, 9, 10],
             3: [11, 12, 13, 14], 4: [16, 17, 18]}

  @property
  def name(self):
    return "newsgroup5"

  @property
  def labels(self):
    return ["misc", "comp", "rec", "sci", "politics"]

  def _load(self, partition: str):
    x, y = super()._load(partition)
    remap = np.zeros(20, "int64")
    for k, idxs in self._GROUPS.items():
      remap[idxs] = k
    return x, remap[y]


class Newsgroup20_clean(NLPDataset):
  """Pre-cleaned 20-newsgroups word-count matrix for topic modelling
  (reference ``nlp_data/newsgroup20_clean.py:52``: the AVITM BoW corpus,
  unlabelled; train split 90/10 into train/valid with seed 1).  npz-gated
  (no egress): expects ``newsgroup20_clean.npz`` with keys ``x_train``
  (docs x vocab counts), ``x_test``, ``vocab`` (word array)."""

  def __init__(self, path: Optional[str] = None, seed: int = 1):
    super().__init__(seed=seed)
    import os

    from odin_tpu.utils import get_data_path
    self.path = path or os.path.join(get_data_path(),
                                     "newsgroup20_clean.npz")
    self._cache = None

  @property
  def name(self):
    return "newsgroup20clean"

  def _fetch(self):
    import os
    if self._cache is None:
      if not os.path.exists(self.path):
        raise FileNotFoundError(
            f"newsgroup20_clean not found at {self.path}; no network "
            "egress — place an .npz with x_train/x_test/vocab there, or "
            "use SyntheticBoW for testing")
      self._cache = dict(np.load(self.path, allow_pickle=False))
    return self._cache

  @property
  def vocabulary(self):
    vocab = self._fetch()["vocab"]
    return {i: str(w) for i, w in enumerate(vocab)}

  @property
  def vocabulary_size(self) -> int:
    return len(self._fetch()["vocab"])

  @property
  def shape(self):
    return (self._fetch()["x_train"].shape[1],)

  @property
  def labels(self):
    return []

  def _load(self, partition: str):
    arr = self._fetch()
    x_train, x_test = arr["x_train"], arr["x_test"]
    rand = np.random.RandomState(seed=1)  # reference split semantics
    ids = rand.permutation(x_train.shape[0])
    start = int(0.1 * x_train.shape[0])
    return get_partition(
        partition,
        train=(x_train[ids[start:]], None),
        valid=(x_train[ids[:start]], None),
        test=(x_test, None))


class MathArithmetic(NLPDataset):
  """Character-level arithmetic problems -> answers
  (reference ``nlp_data/_base.py:495`` `MathArithmetic`).  Fully procedural:
  generates "a op b = c" strings tokenized at char level."""

  VOCAB = "0123456789+-* ="

  def __init__(self, n_samples: int = 20000, max_operand: int = 99,
               maxlen: int = 12, seed: int = 1):
    super().__init__(seed=seed)
    rng = np.random.RandomState(seed)
    self.maxlen = int(maxlen)
    self.char_to_id = {c: i + 1 for i, c in enumerate(self.VOCAB)}  # 0 = pad
    probs, answers = [], []
    for _ in range(n_samples):
      a, b = rng.randint(0, max_operand + 1, 2)
      op = rng.choice(["+", "-", "*"])
      c = {"+": a + b, "-": a - b, "*": a * b}[op]
      probs.append(f"{a}{op}{b}")
      answers.append(str(c))
    self._x = self._encode(probs)
    self._y = self._encode(answers)

  def _encode(self, texts):
    out = np.zeros((len(texts), self.maxlen), np.int64)
    for i, t in enumerate(texts):
      ids = [self.char_to_id[ch] for ch in t[:self.maxlen]]
      out[i, :len(ids)] = ids
    return out

  @property
  def name(self):
    return "matharithmetic"

  @property
  def shape(self):
    return (self.maxlen,)

  @property
  def vocab_size(self):
    return len(self.VOCAB) + 1

  def decode(self, ids) -> str:
    inv = {i: c for c, i in self.char_to_id.items()}
    return "".join(inv.get(int(i), "") for i in np.asarray(ids).ravel())

  def _load(self, partition: str):
    n = len(self._x)
    sl = get_partition(partition, train=slice(0, int(0.8 * n)),
                       valid=slice(int(0.8 * n), int(0.9 * n)),
                       test=slice(int(0.9 * n), n))
    return self._x[sl], self._y[sl]


class _LocalTextDataset(NLPDataset):
  """Character-level dataset from a local text file (no egress)."""

  _name = ""
  _filename = ""

  def __init__(self, path: Optional[str] = None, seq_len: int = 128,
               seed: int = 1):
    super().__init__(seed=seed)
    import os
    from odin_tpu.utils import get_data_path
    self.seq_len = int(seq_len)
    self.path = path or os.path.join(get_data_path(), self._filename)
    self._cache = None

  @property
  def name(self):
    return self._name

  @property
  def shape(self):
    return (self.seq_len,)

  def _load(self, partition: str):
    import os
    if not os.path.exists(self.path):
      raise FileNotFoundError(
          f"'{self._name}' text not found at {self.path} (no network "
          "egress); use MathArithmetic or SyntheticBoW for testing")
    if self._cache is None:
      text = open(self.path, encoding="utf-8", errors="replace").read()
      vocab = sorted(set(text))
      self.char_to_id = {c: i for i, c in enumerate(vocab)}
      ids = np.asarray([self.char_to_id[c] for c in text], np.int64)
      n_seq = len(ids) // self.seq_len
      self._cache = ids[:n_seq * self.seq_len].reshape(n_seq, self.seq_len)
    x = self._cache
    n = len(x)
    sl = get_partition(partition, train=slice(0, int(0.9 * n)),
                       valid=slice(int(0.9 * n), int(0.95 * n)),
                       test=slice(int(0.95 * n), n))
    return x[sl], None


class TinyShakespear(_LocalTextDataset):
  """Reference ``nlp_data/_base.py:472``."""
  _name = "tinyshakespear"
  _filename = "tinyshakespeare.txt"


class ImdbReview(_LocalTextDataset):
  """Reference ``nlp_data/_base.py:453``."""
  _name = "imdbreview"
  _filename = "imdb.txt"


class SyntheticBoW(NLPDataset):
  """LDA-generated bag-of-words corpus with known topics — ground truth for
  topic-model tests."""

  def __init__(self, n_docs: int = 2000, n_words: int = 200,
               n_topics: int = 8, doc_length: int = 80, seed: int = 1):
    super().__init__(seed=seed)
    self.n_words = int(n_words)
    self.n_topics = int(n_topics)
    rng = np.random.RandomState(seed)
    self.topics = rng.dirichlet(np.full(n_words, 0.05), size=n_topics)
    theta = rng.dirichlet(np.full(n_topics, 0.3), size=n_docs)
    word_p = theta @ self.topics
    x = np.stack([rng.multinomial(doc_length, p) for p in word_p])
    self._x = x.astype("float32")
    self._y = theta.argmax(-1).astype("int64")

  @property
  def name(self):
    return "syntheticbow"

  @property
  def shape(self):
    return (self.n_words,)

  @property
  def labels(self):
    return [f"topic{i}" for i in range(self.n_topics)]

  def _load(self, partition: str):
    n = len(self._x)
    sl = get_partition(partition, train=slice(0, int(0.8 * n)),
                       valid=slice(int(0.8 * n), int(0.9 * n)),
                       test=slice(int(0.9 * n), n))
    return self._x[sl], self._y[sl]
