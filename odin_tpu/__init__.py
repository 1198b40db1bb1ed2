"""odin-tpu — a TPU-native JAX framework with the capabilities of trungnt13/odin-ai.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit):

- ``odin_tpu.bay`` — probabilistic core: in-repo distribution library (pytree
  distributions with ``log_prob``/``sample``/``kl_divergence``), the string alias
  registry, ``RVconf`` descriptors and ``DistributionDense`` heads
  (reference: ``odin/bay``).
- ``odin_tpu.bay.vi`` — the VAE zoo (~40 variants) and the Disentanglement Gym
  (MIG/DCI/SAP/beta-VAE/FactorVAE scores) (reference: ``odin/bay/vi``).
- ``odin_tpu.fuel`` — dataset API with ``create_dataset`` semantics, device-
  prefetched + mesh-sharded iterators (reference: ``odin/fuel``).
- ``odin_tpu.networks`` — flax-based network factories, ``get_networks``
  per-dataset architectures (reference: ``odin/networks``).
- ``odin_tpu.training`` — Trainer / EarlyStopping / checkpoints / ScoreBoard
  (reference: ``odin/training``).
- ``odin_tpu.preprocessing`` — DSP kernels (STFT/mel/MFCC/delta/CMVN/VAD) with a
  NumPy reference path and a fused XLA/Pallas batched path
  (reference: ``odin/preprocessing``).
- ``odin_tpu.ml`` — classical ML: PCA/PPCA, GMM-UBM, i-vector (T-matrix), PLDA,
  with EM sufficient statistics as batched XLA matmuls + ``psum`` reductions
  (reference: ``odin/ml``).
- ``odin_tpu.parallel`` — the device-mesh layer: mesh creation, sharding helpers,
  data/tensor-parallel specs (no counterpart in the single-node reference).
"""

__version__ = "0.1.0"

from odin_tpu.parallel import get_mesh, replicate, shard_batch


def __getattr__(name):
  # lazy subpackage access: `odin_tpu.bay`, `odin_tpu.fuel`, ... without
  # paying every import at package load
  import importlib
  if name in ("bay", "backend", "fuel", "networks", "training",
              "preprocessing", "ml", "ops", "visual", "stats", "search",
              "explain", "utils", "parallel", "native"):
    return importlib.import_module(f"odin_tpu.{name}")
  raise AttributeError(f"module 'odin_tpu' has no attribute '{name}'")
