"""Diagonal alignment search for correlation matrices.

Reference: ``odin/search/diag_search.py:108,190`` (`diagonal_beam_search`,
`diagonal_linear_assignment`) and ``odin/search/assignment.py:5``
(Hungarian `search_assignment`): reorder rows of a latent-factor correlation
matrix so its diagonal magnitude is maximized (for plot alignment).
"""
from __future__ import annotations

from typing import List

import numpy as np

__all__ = ["search_assignment", "diagonal_linear_assignment",
           "diagonal_beam_search"]


def search_assignment(matrix: np.ndarray, maximize: bool = True) -> np.ndarray:
  """Hungarian assignment of rows to columns (reference
  ``assignment.py:5``); returns column index per row."""
  from scipy.optimize import linear_sum_assignment
  rows, cols = linear_sum_assignment(np.asarray(matrix), maximize=maximize)
  return cols


def diagonal_linear_assignment(matrix: np.ndarray) -> np.ndarray:
  """Row ordering that places each column's best row on the diagonal
  (reference ``diag_search.py:190``).  Works for non-square [n_rows >=
  n_cols] matrices: assigned rows first, leftovers appended by row-max."""
  from scipy.optimize import linear_sum_assignment
  m = np.asarray(matrix, dtype=np.float64)
  n_rows, n_cols = m.shape
  rows, cols = linear_sum_assignment(m.T, maximize=True)  # cols: row per col
  order = list(cols[np.argsort(rows)])  # row index for col 0..n_cols-1
  leftover = [i for i in range(n_rows) if i not in set(order)]
  leftover.sort(key=lambda i: -m[i].max())
  return np.asarray(order + leftover, dtype=np.int64)


def diagonal_beam_search(matrix: np.ndarray, beam_size: int = 8) -> np.ndarray:
  """Beam search over row orderings maximizing the diagonal sum
  (reference ``diag_search.py:108``)."""
  m = np.asarray(matrix, dtype=np.float64)
  n_rows, n_cols = m.shape
  beams: List = [((), 0.0)]
  for col in range(min(n_cols, n_rows)):
    candidates = []
    for used, score in beams:
      used_set = set(used)
      for r in range(n_rows):
        if r not in used_set:
          candidates.append((used + (r,), score + m[r, col]))
    candidates.sort(key=lambda t: -t[1])
    beams = candidates[:beam_size]
  best = list(beams[0][0])
  leftover = [i for i in range(n_rows) if i not in set(best)]
  return np.asarray(best + leftover, dtype=np.int64)


def diagonal_bruteforce_search(matrix: np.ndarray) -> np.ndarray:
  """Exact diagonal maximization by enumerating all row permutations with
  Heap's algorithm (reference ``diag_search.py:37``; same row-ordering
  convention as the other functions here — the reference permutes columns,
  which is this on the transpose).  O(n!): use for n <= 9."""
  m = np.asarray(matrix, dtype=np.float64)
  n_rows, n_cols = m.shape
  n = n_rows
  assert n <= 10, f"bruteforce over {n}! permutations is infeasible"
  min_dim = min(n_rows, n_cols)
  A = list(range(n))
  best_perm = list(A)
  best_diag = sum(m[r, c] for c, r in enumerate(A[:min_dim]))
  c_state = [0] * n
  i = 0
  while i < n:
    if c_state[i] < i:
      if i % 2 == 0:
        A[0], A[i] = A[i], A[0]
      else:
        A[c_state[i]], A[i] = A[i], A[c_state[i]]
      diag = sum(m[r, c] for c, r in enumerate(A[:min_dim]))
      if diag > best_diag:
        best_diag = diag
        best_perm = list(A)
      c_state[i] += 1
      i = 0
    else:
      c_state[i] = 0
      i += 1
  return np.asarray(best_perm, dtype=np.int64)


def diagonal_greedy_search(matrix: np.ndarray) -> np.ndarray:
  """Greedy diagonal maximization: repeatedly take the global maximum
  (row, col) pair and pin that row to that column (reference
  ``diag_search.py:152``)."""
  m = np.asarray(matrix, dtype=np.float64).copy()
  n_rows, n_cols = m.shape
  order = np.arange(n_rows)
  # only the first min_dim columns lie on the diagonal
  m[:, min(n_rows, n_cols):] = -np.inf
  for _ in range(min(n_rows, n_cols)):
    r, c = np.unravel_index(np.argmax(m), m.shape)
    order[c] = r
    m[r, :] = -np.inf
    m[:, c] = -np.inf
  placed = set(order[:min(n_rows, n_cols)])
  leftover = [i for i in range(n_rows) if i not in placed]
  return np.asarray(list(order[:min(n_rows, n_cols)]) + leftover,
                    dtype=np.int64)


def diagonal_hillclimb_search(matrix: np.ndarray) -> np.ndarray:
  """Beam search with beam size 1 (reference ``diag_search.py:157``)."""
  return diagonal_beam_search(matrix, beam_size=1)


__all__ += ["diagonal_bruteforce_search", "diagonal_greedy_search",
            "diagonal_hillclimb_search"]


from odin_tpu.search.beam_search import (beam_search, beam_search_decode,
                                         greedy_search)

__all__ += ["beam_search", "greedy_search", "beam_search_decode"]
