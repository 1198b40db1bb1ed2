"""Parallel layer: mesh helpers, TP sharding rules, sharded EM, device-
resident training."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from odin_tpu import parallel
from odin_tpu.parallel.tensor_parallel import (megatron_rules,
                                               param_shardings,
                                               shard_params_by_rules)


def test_mesh_and_batch_sharding():
  mesh = parallel.get_mesh()
  n = mesh.devices.size
  assert n == len(jax.devices())
  b = parallel.shard_batch(np.ones((2 * n, 3), "f"), mesh)
  assert b.sharding.spec == P("data", None)
  r = parallel.replicate(jnp.ones((4,)), mesh)
  assert r.sharding.spec == P()
  with pytest.raises(ValueError):
    parallel.local_batch_size(n + 1, mesh)


def test_param_sharding_rules():
  n = len(jax.devices())
  if n % 2:
    pytest.skip("needs an even device count")
  mesh = parallel.get_mesh(("data", "model"), (n // 2, 2))
  params = {
      "encoder": {"layers_6": {"Dense_0": {"kernel": np.ones((64, 32), "f"),
                                           "bias": np.ones((32,), "f")}}},
      "latents": {"projection": {"kernel": np.ones((32, 16), "f")}},
      "other": np.ones((8,), "f"),
  }
  sharded = shard_params_by_rules(params, mesh, megatron_rules("model"))
  assert sharded["encoder"]["layers_6"]["Dense_0"]["kernel"].sharding.spec \
      == P(None, "model")
  assert sharded["latents"]["projection"]["kernel"].sharding.spec \
      == P(None, "model")
  # non-matching leaves stay replicated
  assert sharded["other"].sharding.spec == P()
  # bias paths don't match the kernel rules -> replicated
  specs = param_shardings(params, mesh, megatron_rules("model"))
  assert specs["encoder"]["layers_6"]["Dense_0"]["bias"].spec == P()


def test_gmm_sharded_expectation_matches():
  from odin_tpu.ml import GMM
  rng = np.random.RandomState(0)
  X = np.concatenate([rng.randn(501, 3) * 0.5 + m
                      for m in ([0, 0, 0], [4, 4, 4])]).astype("f")
  gmm = GMM(nmix=2, batch_size=512).fit(X)
  Z1, F1, S1, llk1 = gmm.expectation(X)
  Z2, F2, S2, llk2 = gmm.expectation_sharded(X)
  np.testing.assert_allclose(Z1, Z2, rtol=1e-5, atol=1e-4)
  np.testing.assert_allclose(F1, F2, rtol=1e-5, atol=1e-4)
  np.testing.assert_allclose(S1, S2, rtol=1e-5, atol=1e-4)
  assert abs(llk1 - llk2) < 1e-2


def test_device_dataset_training():
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks
  X = np.random.RandomState(0).rand(64, 2).astype("f")
  vae = BetaVAE(**get_networks("halfmoons", zdim=2)).build()
  vae.fit_device_dataset(X, n_steps=120, batch_size=16, steps_per_call=60,
                         verbose=False)
  assert vae.step == 120
  # deterministic resume stream: same seed + same state -> same result
  ev = vae.make_eval_fn(jit=False)
  m = jax.device_get(ev(vae.state, X))
  assert np.isfinite(float(m["elbo"]))


def test_multihost_helpers_single_process():
  """initialize_distributed is a no-op single-process; host_local_batch
  reduces to shard_batch."""
  import jax

  from odin_tpu import parallel

  assert parallel.initialize_distributed() == jax.process_index() == 0
  mesh = parallel.get_mesh()
  x = np.arange(32, dtype="f").reshape(16, 2)
  g = parallel.host_local_batch(x, mesh)
  s = parallel.shard_batch(x, mesh)
  np.testing.assert_allclose(np.asarray(g), np.asarray(s))
  assert g.sharding.spec == s.sharding.spec
