"""Text tokenization (reference: ``odin/preprocessing/text.py``, 737 LoC).

Tokenizer with vocabulary building, frequency filtering, padding, n-grams,
TF-IDF transform — the pieces the reference's `NLPDataset` base
(``odin/fuel/nlp_data/_base.py:54``) consumes.
"""
from __future__ import annotations

import re
from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

__all__ = ["simple_tokenizer", "Tokenizer", "ngrams"]

_WORD_RE = re.compile(r"[A-Za-z']+|[0-9]+|[^\sA-Za-z0-9]")


def simple_tokenizer(text: str, lower: bool = True,
                     keep_punct: bool = False) -> List[str]:
  if lower:
    text = text.lower()
  tokens = _WORD_RE.findall(text)
  if not keep_punct:
    tokens = [t for t in tokens if any(c.isalnum() for c in t)]
  return tokens


def ngrams(tokens: Sequence[str], n: int = 2) -> List[str]:
  return ["_".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


class Tokenizer:
  """Vocabulary-building tokenizer with encode/decode/pad and matrix modes.

  Special ids: 0 = <pad>, 1 = <unk>.
  """

  def __init__(self, n_words: Optional[int] = None, min_freq: int = 1,
               lower: bool = True, char_level: bool = False):
    self.n_words = n_words
    self.min_freq = int(min_freq)
    self.lower = bool(lower)
    self.char_level = bool(char_level)
    self.word_index: Dict[str, int] = {}
    self.index_word: Dict[int, str] = {}
    self.counts: Counter = Counter()

  def _tokenize(self, text: str) -> List[str]:
    if self.char_level:
      return list(text.lower() if self.lower else text)
    return simple_tokenizer(text, lower=self.lower)

  def fit(self, texts: Iterable[str]) -> "Tokenizer":
    for t in texts:
      self.counts.update(self._tokenize(t))
    vocab = [w for w, c in self.counts.most_common()
             if c >= self.min_freq]
    if self.n_words is not None:
      vocab = vocab[:self.n_words - 2]
    self.word_index = {w: i + 2 for i, w in enumerate(vocab)}
    self.word_index["<pad>"] = 0
    self.word_index["<unk>"] = 1
    self.index_word = {i: w for w, i in self.word_index.items()}
    return self

  @property
  def vocab_size(self) -> int:
    return len(self.word_index)

  def encode(self, text: str) -> List[int]:
    return [self.word_index.get(w, 1) for w in self._tokenize(text)]

  def decode(self, ids: Sequence[int]) -> str:
    sep = "" if self.char_level else " "
    return sep.join(self.index_word.get(int(i), "<unk>") for i in ids
                    if int(i) != 0)

  def transform(self, texts: Sequence[str], maxlen: Optional[int] = None,
                mode: str = "seq") -> np.ndarray:
    """mode: 'seq' (padded id sequences), 'count' (BoW counts), 'tfidf',
    'binary'."""
    if mode == "seq":
      seqs = [self.encode(t) for t in texts]
      maxlen = maxlen or max((len(s) for s in seqs), default=1)
      out = np.zeros((len(seqs), maxlen), np.int64)
      for i, s in enumerate(seqs):
        s = s[:maxlen]
        out[i, :len(s)] = s
      return out
    V = self.vocab_size
    mat = np.zeros((len(texts), V), np.float32)
    for i, t in enumerate(texts):
      for idx in self.encode(t):
        mat[i, idx] += 1.0
    if mode == "count":
      return mat
    if mode == "binary":
      return (mat > 0).astype(np.float32)
    if mode == "tfidf":
      df = (mat > 0).sum(0)
      idf = np.log((1.0 + len(texts)) / (1.0 + df)) + 1.0
      tf = mat / np.maximum(mat.sum(1, keepdims=True), 1.0)
      return tf * idf[None, :]
    raise ValueError(f"unknown mode '{mode}'")

  fit_transform = lambda self, texts, **kw: self.fit(texts).transform(texts, **kw)
