"""Every parallelism mode of odin-tpu on one virtual mesh, in one script.

No counterpart in the reference (it is single-device; SURVEY.md §2.1) —
this demonstrates the TPU-native scaling surface end-to-end on a forced
8-device CPU mesh, so it runs anywhere:

1. data parallel          — replicated params, sharded batch, GSPMD psum
2. tensor parallel        — megatron rules on a ('data','model') mesh
3. FSDP / ZeRO-3          — params + optimizer moments sharded on 'data'
3b. FSDP x TP composed    — megatron specs on 'model' + FSDP on 'data'
4. pipeline parallel      — GPipe ppermute stage rotation
5. expert parallel        — dense psum mixture AND top-k all_to_all routing
6. ring attention         — K/V rotation + cross-device online softmax

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/parallelism_demo.py
(the script forces the CPU mesh itself if the env is not set)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 8


def main():
  os.environ.setdefault("XLA_FLAGS",
                        f"--xla_force_host_platform_device_count={N}")
  os.environ["JAX_PLATFORMS"] = "cpu"
  import jax
  jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp
  import numpy as np

  from odin_tpu import parallel
  from odin_tpu.bay.random_variable import RVconf
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks.base import Dense, Flatten, SequentialNetwork

  def make_vae():
    enc = SequentialNetwork((Flatten(), Dense(64, "relu")), name="encoder")
    dec = SequentialNetwork((Dense(64, "relu"),), name="decoder")
    return BetaVAE(encoder=enc, decoder=dec,
                   latents=RVconf((8,), "mvndiag", projection=True,
                                  name="latents"),
                   observation=RVconf((16,), "gaussian", projection=True,
                                      name="obs"),
                   input_shape=(16,)).build(seed=1)

  x = np.random.RandomState(0).rand(2 * N, 16).astype("f")

  # 1. data parallel
  mesh = parallel.get_mesh(devices=jax.devices()[:N])
  parallel.set_default_mesh(mesh)
  vae = make_vae()
  step = vae.make_step_fn(learning_rate=1e-3)
  state = parallel.replicate(vae.state, mesh)
  state, m = step(state, parallel.shard_batch(x, mesh))
  print(f"[dp]       loss {float(m['loss']):.3f} over {N} devices")

  # 2. tensor parallel (DP x TP)
  from odin_tpu.parallel.tensor_parallel import (megatron_rules,
                                                 shard_params_by_rules)
  mesh2 = parallel.get_mesh(("data", "model"), (N // 2, 2),
                            devices=jax.devices()[:N])
  parallel.set_default_mesh(mesh2)
  vae2 = make_vae()
  step2 = vae2.make_step_fn(learning_rate=1e-3)  # also inits opt_states
  host = jax.device_get(vae2.state)
  params = dict(host.params)
  params["vae"] = shard_params_by_rules(params["vae"], mesh2,
                                        megatron_rules("model"))
  st2 = host.replace(params=params,
                     opt_states=shard_params_by_rules(
                         host.opt_states, mesh2, megatron_rules("model")),
                     step=jax.device_put(host.step),
                     rng=jax.device_put(host.rng))
  st2, m2 = step2(st2, parallel.shard_batch(x, mesh2))
  print(f"[dp x tp]  loss {float(m2['loss']):.3f} on mesh "
        f"{dict(mesh2.shape)}")
  parallel.set_default_mesh(mesh)

  # 3. FSDP
  from odin_tpu.parallel.fsdp import shard_state_fsdp
  vae3 = make_vae()
  step3 = vae3.make_step_fn(learning_rate=1e-3)
  st3 = shard_state_fsdp(vae3.state, mesh, min_size=64)
  n_sharded = sum(1 for l in jax.tree_util.tree_leaves(st3.params)
                  if "data" in str(l.sharding.spec))
  st3, m3 = step3(st3, parallel.shard_batch(x, mesh))
  print(f"[fsdp]     loss {float(m3['loss']):.3f}, "
        f"{n_sharded} param leaves sharded (ZeRO-3 layout)")

  # 3b. FSDP x TP composed (the production stack)
  from odin_tpu.parallel.fsdp import shard_state_fsdp_tp
  parallel.set_default_mesh(mesh2)
  vae3b = make_vae()
  step3b = vae3b.make_step_fn(learning_rate=1e-3)
  st3b = shard_state_fsdp_tp(vae3b.state, mesh2, megatron_rules("model"),
                             min_size=64)
  n_both = sum(1 for l in jax.tree_util.tree_leaves(st3b.params)
               if "data" in str(l.sharding.spec)
               and "model" in str(l.sharding.spec))
  st3b, m3b = step3b(st3b, parallel.shard_batch(x, mesh2))
  print(f"[fsdp x tp] loss {float(m3b['loss']):.3f}, "
        f"{n_both} leaves sharded on BOTH axes")
  parallel.set_default_mesh(mesh)

  # 4. pipeline parallel
  from odin_tpu.parallel.pipeline import (merge_microbatches,
                                          pipeline_apply,
                                          split_microbatches,
                                          stack_stage_params)
  pmesh = parallel.get_mesh(("stage",), (N,))
  rng = np.random.RandomState(1)
  stage_params = stack_stage_params([
      {"w": jnp.asarray(rng.randn(16, 16).astype("f") * 0.3)}
      for _ in range(N)])

  def stage_fn(p, h):
    return jnp.tanh(h @ p["w"])

  xp = jnp.asarray(rng.randn(N * 2, 16).astype("f"))
  out = merge_microbatches(
      pipeline_apply(stage_fn, stage_params, split_microbatches(xp, N),
                     pmesh))
  print(f"[pipeline] {N} stages, out mean {float(jnp.mean(out)):.4f}")

  # 5. expert parallel: dense + top-k routed
  from odin_tpu.parallel.expert import (moe_apply, softmax_gates,
                                        stack_expert_params, topk_moe_apply)
  emesh = parallel.get_mesh(("expert",), (N,))
  experts = stack_expert_params([
      {"w": jnp.asarray(rng.randn(16, 16).astype("f") * 0.3)}
      for _ in range(N)])
  gate = jnp.asarray(rng.randn(16, N).astype("f"))

  def expert_fn(p, t):
    return jnp.tanh(t @ p["w"])

  xe = jnp.asarray(rng.randn(16, 16).astype("f"))
  dense = moe_apply(expert_fn, experts, softmax_gates(xe, gate), xe, emesh)
  routed = topk_moe_apply(expert_fn, experts, gate, xe, emesh, k=2)
  print(f"[expert]   dense-psum mean {float(jnp.mean(dense)):.4f}, "
        f"top-2 all_to_all mean {float(jnp.mean(routed)):.4f}")

  # 6. ring attention
  from odin_tpu.parallel.ring_attention import (full_attention_reference,
                                                ring_attention)
  smesh = parallel.get_mesh(("seq",), (N,))
  q, k, v = (jnp.asarray(rng.randn(2, 4 * N, 2, 8).astype("f"))
             for _ in range(3))
  ring = ring_attention(q, k, v, smesh)
  err = float(jnp.max(jnp.abs(ring - full_attention_reference(q, k, v))))
  print(f"[ring]     seq {4 * N} over {N} devices, "
        f"max |ring - full| = {err:.2e}")


if __name__ == "__main__":
  main()
