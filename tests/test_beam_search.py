"""Beam/greedy path search and on-device beam decoding.

The reference declares ``beam_search``/``greedy_search`` as empty stubs
(``odin/search/beam_search.py:4-8``); these tests pin the real
implementations: exactness vs brute force on small problems, and the
`lax.scan` beam decoder's backtrace against exhaustive path enumeration.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odin_tpu.search import beam_search, beam_search_decode, greedy_search


def test_greedy_is_beam1():
  rng = np.random.RandomState(0)
  m = rng.randn(6, 5)
  path, score = greedy_search(m)
  paths, scores = beam_search(m, beam_size=1, n_best=1)
  np.testing.assert_array_equal(path, paths[0])
  assert score == pytest.approx(scores[0])
  assert score == pytest.approx(m.max(axis=1).sum())


def test_beam_search_exact_without_transition():
  """Independent steps: the n_best paths are the top-k cartesian
  combinations — beam search with beam >= n_best must find them exactly."""
  rng = np.random.RandomState(1)
  m = rng.randn(4, 3)
  paths, scores = beam_search(m, beam_size=4, n_best=4)
  brute = sorted(
      ((sum(m[t, s] for t, s in enumerate(p)), p)
       for p in itertools.product(range(3), repeat=4)),
      key=lambda x: -x[0])[:4]
  for (bs, bp), p, s in zip(brute, paths, scores):
    assert s == pytest.approx(bs)
    assert tuple(p) == bp


def test_beam_search_with_transition_matches_viterbi():
  """With a transition matrix and a full-width beam, the best path must
  equal the exact Viterbi solution."""
  rng = np.random.RandomState(2)
  T, V = 5, 4
  m, trans = rng.randn(T, V), rng.randn(V, V)
  paths, scores = beam_search(m, beam_size=V * V, n_best=1,
                              transition=trans)
  best = max(
      (m[0, p[0]] + sum(m[t, p[t]] + trans[p[t - 1], p[t]]
                        for t in range(1, T)), p)
      for p in itertools.product(range(V), repeat=T))
  assert scores[0] == pytest.approx(best[0])
  assert tuple(paths[0]) == best[1]


def test_beam_search_validates_shapes():
  with pytest.raises(ValueError):
    beam_search(np.zeros((3,)))
  with pytest.raises(ValueError):
    beam_search(np.zeros((3, 4)), transition=np.zeros((2, 2)))


def _toy_step(W):
  """Linear autoregressive cell: carry (H,), token embedding = one-hot."""
  V, H = W.shape

  def step(carry, token):
    carry = jnp.tanh(carry + W[token])
    logits = carry @ W.T
    return carry, logits

  return step


def test_beam_decode_full_width_is_exhaustive():
  """beam_size = V^T >= all paths: the decoder's best path/score must match
  exhaustive enumeration of every token sequence."""
  rng = np.random.RandomState(3)
  V, H, T = 3, 4, 3
  W = jnp.asarray(rng.randn(V, H), jnp.float32)
  step = _toy_step(W)
  start = jnp.zeros((2,), jnp.int32)
  carry0 = jnp.zeros((2, H), jnp.float32)
  toks, scores = jax.jit(
      lambda c, s: beam_search_decode(step, c, s, length=T,
                                      beam_size=V ** T, n_best=1))(
                                          carry0, start)

  # exhaustive: replay every path through the same cell
  def path_score(b, path):
    carry = np.zeros(H, "f")
    tok = int(start[b])
    total = 0.0
    for p in path:
      carry, logits = step(jnp.asarray(carry), jnp.asarray(tok))
      logp = jax.nn.log_softmax(logits)
      total += float(logp[p])
      carry, tok = np.asarray(carry), int(p)
    return total

  for b in range(2):
    best = max((path_score(b, p), p)
               for p in itertools.product(range(V), repeat=T))
    assert float(scores[b, 0]) == pytest.approx(best[0], abs=1e-4)
    assert tuple(np.asarray(toks[b, 0])) == best[1]


def test_beam_decode_narrow_beam_le_exact():
  """A narrow beam can only do worse or equal — and must return sorted
  scores and int32 tokens of the right shape."""
  rng = np.random.RandomState(4)
  V, H, T, B = 5, 6, 7, 3
  W = jnp.asarray(rng.randn(V, H), jnp.float32)
  step = _toy_step(W)
  start = jnp.asarray(rng.randint(0, V, B), jnp.int32)
  carry0 = jnp.asarray(rng.randn(B, H), jnp.float32)
  toks2, sc2 = beam_search_decode(step, carry0, start, length=T,
                                  beam_size=2, n_best=2)
  toksW, scW = beam_search_decode(step, carry0, start, length=T,
                                  beam_size=32, n_best=2)
  assert toks2.shape == (B, 2, T) and toks2.dtype == jnp.int32
  assert np.all(np.asarray(sc2[:, 0]) >= np.asarray(sc2[:, 1]) - 1e-6)
  assert np.all(np.asarray(scW[:, 0]) >= np.asarray(sc2[:, 0]) - 1e-6)
