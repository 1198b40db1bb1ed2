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
