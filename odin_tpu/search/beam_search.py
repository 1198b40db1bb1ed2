"""Beam / greedy path search over score matrices and sequence models.

Reference: ``odin/search/beam_search.py:4-8`` declares
``beam_search(matrix, beam_size=2, n_best=4)`` and ``greedy_search()`` but
leaves both as empty stubs — this module implements them for real (above
parity).  Two regimes:

* **Matrix paths** (`beam_search`, `greedy_search`): a (T, V) matrix of
  per-step log-scores, optionally coupled by a (V, V) transition matrix —
  beam search returns the `n_best` highest-scoring symbol paths.  Host
  numpy: T and V are small (alignment/debug use), a device kernel would be
  all launch overhead.
* **Autoregressive decoding** (`beam_search_decode`): TPU-native beam
  decoding for sequence models — one `lax.scan` over time with a
  `jax.lax.top_k` beam contraction per step, so the whole decode compiles
  to a single XLA program (no per-step host round trips).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

__all__ = ["beam_search", "greedy_search", "beam_search_decode"]


def beam_search(matrix: np.ndarray,
                beam_size: int = 2,
                n_best: int = 4,
                transition: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
  """N-best symbol paths through a (T, V) log-score matrix.

  Without `transition`, steps are independent and the search is exact
  whenever ``beam_size >= n_best``.  With a (V, V) `transition` matrix
  (``transition[i, j]`` = log-score of symbol ``j`` following ``i``), the
  beam prunes to `beam_size` hypotheses per step (standard Viterbi-style
  beam).

  Returns ``(paths, scores)``: int64 ``(n_best, T)`` and float64
  ``(n_best,)``, best first.  Reference signature:
  ``odin/search/beam_search.py:4`` (stub).
  """
  m = np.asarray(matrix, dtype=np.float64)
  if m.ndim != 2:
    raise ValueError(f"matrix must be (T, V), got {m.shape}")
  T, V = m.shape
  beam_size = max(int(beam_size), 1)
  n_best = max(int(n_best), 1)
  width = max(beam_size, n_best)
  if transition is not None:
    transition = np.asarray(transition, dtype=np.float64)
    if transition.shape != (V, V):
      raise ValueError(f"transition must be {(V, V)}, got {transition.shape}")

  # beams: (hypotheses list of symbol tuples, scores)
  order = np.argsort(-m[0])[:width]
  hyps = [(s,) for s in order]
  scores = [m[0, s] for s in order]
  for t in range(1, T):
    cand = []
    for h, sc in zip(hyps, scores):
      prev = h[-1]
      step = m[t] if transition is None else m[t] + transition[prev]
      top = np.argsort(-step)[:width]
      cand.extend((h + (int(s),), sc + step[s]) for s in top)
    cand.sort(key=lambda p: -p[1])
    cand = cand[:width]
    hyps = [c[0] for c in cand]
    scores = [c[1] for c in cand]
  paths = np.asarray(hyps[:n_best], dtype=np.int64)
  return paths, np.asarray(scores[:n_best], dtype=np.float64)


def greedy_search(matrix: np.ndarray) -> Tuple[np.ndarray, float]:
  """Per-step argmax path through a (T, V) log-score matrix — the
  ``beam_size=1`` special case (reference ``beam_search.py:7``, stub).
  Returns ``(path (T,), score)``."""
  m = np.asarray(matrix, dtype=np.float64)
  path = np.argmax(m, axis=-1)
  return path.astype(np.int64), float(m[np.arange(m.shape[0]), path].sum())


def beam_search_decode(step_fn: Callable,
                       init_carry,
                       start_tokens,
                       length: int,
                       beam_size: int = 4,
                       n_best: int = 1):
  """Batched beam decoding compiled to one XLA program.

  ``step_fn(carry, token) -> (carry, logits)`` is the autoregressive cell
  (e.g. an LSTM/GRU step): token int32 ``(N,)``, logits ``(N, V)``.  It is
  vmapped over the flattened batch*beam axis, scanned over `length` steps,
  and each step keeps the global top-`beam_size` continuations via
  ``lax.top_k`` — decoding stays on-device end to end.

  Returns ``(tokens (B, n_best, length), scores (B, n_best))``, best first.
  """
  import jax
  import jax.numpy as jnp

  start_tokens = jnp.asarray(start_tokens, jnp.int32)
  B = start_tokens.shape[0]
  K = int(beam_size)

  def tile_beam(x):
    return jnp.broadcast_to(x[:, None], (B, K) + x.shape[1:])

  carry0 = jax.tree_util.tree_map(tile_beam, init_carry)
  tok0 = jnp.broadcast_to(start_tokens[:, None], (B, K))
  # only beam 0 is live at t=0 — duplicates would fill the whole beam with
  # copies of one hypothesis after the first top-k
  sc0 = jnp.where(jnp.arange(K)[None, :] == 0, 0.0, -jnp.inf)
  sc0 = jnp.broadcast_to(sc0, (B, K))

  def flat(x):
    return x.reshape((B * K,) + x.shape[2:])

  def unflat(x):
    return x.reshape((B, K) + x.shape[1:])

  def scan_step(state, _):
    tok, sc, carry = state
    carry_f = jax.tree_util.tree_map(flat, carry)
    carry_f, logits = jax.vmap(step_fn)(carry_f, flat(tok))
    logp = jax.nn.log_softmax(logits.reshape(B, K, -1), axis=-1)
    V = logp.shape[-1]
    total = sc[..., None] + logp                   # (B, K, V)
    top_sc, top_ix = jax.lax.top_k(total.reshape(B, K * V), K)
    beam_ix = top_ix // V                          # which parent beam
    tok_next = (top_ix % V).astype(jnp.int32)      # which symbol
    carry = jax.tree_util.tree_map(
        lambda c: jnp.take_along_axis(
            unflat(c),
            beam_ix.reshape((B, K) + (1,) * (c.ndim - 1)).astype(jnp.int32),
            axis=1),
        carry_f)
    return (tok_next, top_sc, carry), (tok_next, beam_ix)

  (_, sc_T, _), (toks, parents) = jax.lax.scan(
      scan_step, (tok0, sc0, carry0), None, length=length)

  # backtrace the beam ancestry: parents[t] maps beam slots at t to slots
  # at t-1; walk from the final ordering back to t=0
  def backtrace(carry_ix, t):
    toks_t, par_t = t
    tok = jnp.take_along_axis(toks_t, carry_ix, axis=1)
    carry_ix = jnp.take_along_axis(par_t, carry_ix, axis=1)
    return carry_ix, tok

  final_ix = jnp.broadcast_to(jnp.arange(K)[None, :], (B, K))
  _, rev_toks = jax.lax.scan(backtrace, final_ix, (toks, parents),
                             reverse=True)
  # rev_toks: (length, B, K) already in original time order (reverse scan
  # consumes t = length-1..0 but stacks outputs back in input order)
  out = jnp.transpose(rev_toks, (1, 2, 0))         # (B, K, length)
  return out[:, :n_best], sc_T[:, :n_best]
