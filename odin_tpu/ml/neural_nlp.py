"""HuggingFace Transformer embedding wrapper.

Reference: ``odin/ml/neural_nlp.py:34`` (`Transformer`) — wraps a pretrained
transformers model to embed sentences.  Offline-gated: model weights must be
cached locally (no egress here); raises a clear error otherwise.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

__all__ = ["Transformer"]


class Transformer:

  def __init__(self, model_name: str = "bert-base-uncased",
               pooling: str = "mean", device: str = "cpu"):
    self.model_name = model_name
    self.pooling = pooling
    try:
      from transformers import AutoModel, AutoTokenizer
      self.tokenizer = AutoTokenizer.from_pretrained(model_name,
                                                     local_files_only=True)
      self.model = AutoModel.from_pretrained(model_name,
                                             local_files_only=True)
      self.model.eval()
    except Exception as e:
      raise FileNotFoundError(
          f"transformer '{model_name}' is not cached locally and this "
          "environment has no network egress; pre-download the model or use "
          "the TF-IDF/BoW datasets instead") from e

  def transform(self, sentences: Sequence[str],
                batch_size: int = 16) -> np.ndarray:
    import torch
    out: List[np.ndarray] = []
    with torch.no_grad():
      for i in range(0, len(sentences), batch_size):
        batch = list(sentences[i:i + batch_size])
        enc = self.tokenizer(batch, padding=True, truncation=True,
                             return_tensors="pt")
        h = self.model(**enc).last_hidden_state
        mask = enc["attention_mask"].unsqueeze(-1).float()
        if self.pooling == "mean":
          emb = (h * mask).sum(1) / mask.sum(1)
        elif self.pooling == "cls":
          emb = h[:, 0]
        else:
          emb = (h * mask).max(1).values
        out.append(emb.numpy())
    return np.concatenate(out)

  __call__ = transform
