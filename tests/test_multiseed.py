"""Vmapped multi-seed training (training.core.multiseed_device_dataset_steps).

Published disentanglement results are SEED DISTRIBUTIONS (Locatello et al.
2019: 50 seeds per recipe); the TPU-native answer is to train all seeds as
one vmapped XLA program instead of S sequential runs.  The contract pinned
here: a lane of the stacked run is bit-compatible with the standalone
`device_dataset_steps` run at the same seed (same init, same per-step batch
stream `fold_in(PRNGKey(seed), step)`), so multi-seed results need no
separate validation story.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 4 scanned-conv compiles (~60s on this box)

from odin_tpu.bay.vi import get_vae
from odin_tpu.training.core import (
    device_dataset_steps, multiseed_device_dataset_steps, stack_states,
    unstack_states)

from test_zoo_execution import _tiny_image_networks


def _leaf_allclose(a, b, atol=1e-5):
  la = jax.tree_util.tree_leaves(a)
  lb = jax.tree_util.tree_leaves(b)
  assert len(la) == len(lb)
  return all(np.allclose(x, y, atol=atol) for x, y in zip(la, lb))


@pytest.fixture(scope="module")
def setup():
  X = (np.random.RandomState(0).rand(64, 8, 8, 1) > 0.5).astype(
      np.uint8) * np.uint8(255)
  seeds = [3, 7]
  states, raw = [], None
  vae = get_vae("betavae")(beta=2.0, **_tiny_image_networks())
  for s in seeds:
    vae.build(seed=s)
    raw = vae.make_step_fn(learning_rate=1e-3, jit=False)
    states.append(jax.device_get(vae.state))
  return X, seeds, states, raw


def test_lane_matches_standalone_run(setup):
  X, seeds, states, raw = setup
  n_steps, batch = 5, 8
  solo = jax.jit(device_dataset_steps(raw, batch, n_steps, seed=seeds[1]))
  solo_state, solo_m = solo(states[1], jnp.asarray(X))

  fused = jax.jit(multiseed_device_dataset_steps(raw, batch, n_steps,
                                                 seeds=seeds))
  stacked, m = fused(stack_states(states), jnp.asarray(X))
  lanes = unstack_states(jax.device_get(stacked))
  # lane 1 == the standalone run at the same seed (same batches, same init)
  assert _leaf_allclose(lanes[1].params, jax.device_get(solo_state).params)
  # lanes trained on DIFFERENT streams from different inits must differ
  assert not _leaf_allclose(lanes[0].params, lanes[1].params, atol=1e-7)
  # every metric gains a leading (S,) axis; losses finite
  for v in jax.tree_util.tree_leaves(m):
    assert v.shape[:1] == (len(seeds),)
    assert np.all(np.isfinite(np.asarray(v)))
  # per-lane step counters advanced together
  assert np.all(np.asarray(stacked.step) ==
                np.asarray(solo_state.step))


def test_multiseed_learns_per_lane(setup):
  X, seeds, states, raw = setup
  fused = jax.jit(multiseed_device_dataset_steps(raw, 16, 40, seeds=seeds))
  stacked, m = fused(stack_states(states), jnp.asarray(X))
  eval0 = jax.jit(multiseed_device_dataset_steps(raw, 16, 1, seeds=seeds))
  # loss after 40 steps below the first-step loss for EVERY lane
  _, m0 = eval0(stack_states(states), jnp.asarray(X))
  llk_key = [k for k in m0 if k.startswith("llk")][0]
  assert np.all(np.asarray(m[llk_key]) > np.asarray(m0[llk_key]))
