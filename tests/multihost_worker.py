"""One process of a multi-process (multi-host) data-parallel training run.

Launched by tests/test_multihost.py with N processes, each owning
`--local-devices` virtual CPU devices; together they form ONE global
`jax.sharding.Mesh` via `jax.distributed.initialize` (Gloo collectives).
Every process builds the identical model (same seed), feeds only its own
slice of the global batch through `parallel.host_local_batch`, and runs the
same fused `make_step_fn` update — GSPMD turns the gradient reduction into
cross-process collectives.  Process 0 writes the final (replicated) params
and losses to --out; equality with the single-process mesh run is asserted
by the test.

This is the cluster-level replacement for the reference's multiprocess
``MPI`` pool (``odin/utils/mpi.py:386``): where the reference moves pickled
job results over ZeroMQ sockets, here the processes cooperate inside one
XLA program over the JAX distributed runtime.

Also runnable standalone (single process) for a smoke check:
  python tests/multihost_worker.py --num-processes 1 --out /tmp/p.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--process-id", type=int, default=0)
  ap.add_argument("--num-processes", type=int, default=1)
  ap.add_argument("--port", type=int, default=9733)
  ap.add_argument("--local-devices", type=int, default=2)
  ap.add_argument("--global-batch", type=int, default=16)
  ap.add_argument("--steps", type=int, default=4)
  ap.add_argument("--mode", choices=("train", "gmm"), default="train")
  ap.add_argument("--out", required=True)
  args = ap.parse_args()

  os.environ["XLA_FLAGS"] = (
      os.environ.get("XLA_FLAGS", "")
      + f" --xla_force_host_platform_device_count={args.local_devices}")
  import jax
  jax.config.update("jax_platforms", "cpu")
  if args.num_processes > 1:
    from odin_tpu import parallel
    pid = parallel.initialize_distributed(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes, process_id=args.process_id)
    assert pid == args.process_id
  import numpy as np
  from odin_tpu import parallel
  from odin_tpu.bay.random_variable import RVconf
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks.base import Dense, Flatten, SequentialNetwork

  assert len(jax.devices()) == args.num_processes * args.local_devices

  if args.mode == "gmm":
    return _run_gmm(args)

  enc = SequentialNetwork((Flatten(), Dense(64, "relu"), Dense(64, None)),
                          name="encoder")
  dec = SequentialNetwork((Dense(64, "relu"), Dense(16, None)),
                          name="decoder")
  vae = BetaVAE(encoder=enc, decoder=dec,
                latents=RVconf((8,), "mvndiag", projection=True,
                               name="latents"),
                observation=RVconf((16,), "gaussian", projection=True,
                                   name="obs"),
                input_shape=(16,)).build(seed=3)
  mesh = parallel.get_mesh()
  parallel.set_default_mesh(mesh)
  step = vae.make_step_fn(learning_rate=1e-2)
  state = parallel.replicate(vae.state, mesh)

  # every process generates the SAME global data stream, then feeds only
  # its own contiguous slice — the multi-host input-pipeline contract
  # (per-host shards of one logical batch)
  rng = np.random.RandomState(0)
  per_proc = args.global_batch // args.num_processes
  lo = args.process_id * per_proc
  losses = []
  for _ in range(args.steps):
    full = rng.rand(args.global_batch, 16).astype("f")
    local = full[lo:lo + per_proc]
    batch = parallel.host_local_batch(local, mesh)
    state, m = step(state, batch)
    losses.append(float(m["loss"]))

  if args.process_id == 0:
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)), state.params)
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {jax.tree_util.keystr(p): l for p, l in flat}
    out["__losses__"] = np.asarray(losses, "f")
    np.savez(args.out, **out)
  print(f"[p{args.process_id}] done, losses={losses}", flush=True)


def _run_gmm(args):
  """GMM E-step over a multi-host corpus: each process feeds its LOCAL
  frame slice into `expectation_sharded`; the Z/F/S/llk sufficient stats
  psum-reduce across every process's devices (the classical-ML pillar's
  version of the multi-host contract; SURVEY §2.1 TPU mapping)."""
  import numpy as np
  import jax
  from odin_tpu import parallel
  from odin_tpu.ml import GMM

  rng = np.random.RandomState(0)
  N, D, M = 1024, 6, 4
  X = np.concatenate([rng.randn(N // 2, D) * 0.5 + 2.0,
                      rng.randn(N // 2, D) * 0.8 - 1.0]).astype("f")
  gmm = GMM(nmix=M)
  init = np.random.RandomState(1)
  gmm.mu = init.randn(M, D).astype("f")
  gmm.sigma = (init.rand(M, D) * 0.5 + 0.5).astype("f")
  gmm.w = np.full(M, 1.0 / M, "f")
  gmm.ndim = D
  mesh = parallel.get_mesh()
  parallel.set_default_mesh(mesh)
  if args.num_processes > 1:
    per = N // args.num_processes
    local = X[args.process_id * per:(args.process_id + 1) * per]
  else:
    local = X
  Z, F, S, llk = gmm.expectation_sharded(local, mesh)

  # T-matrix E-step under the same per-process-slice contract
  from odin_tpu.ml import Tmatrix
  tmat = Tmatrix(tv_dim=8, gmm=gmm).initialize()
  B = 64
  Zu = init.rand(B, M).astype("f") * 50.0
  Fu = init.randn(B, M * D).astype("f")
  if args.num_processes > 1:
    per_u = B // args.num_processes
    sl = slice(args.process_id * per_u, (args.process_id + 1) * per_u)
    LU, RU, tllk = tmat.expectation_sharded(Zu[sl], Fu[sl], mesh)
  else:
    LU, RU, tllk = tmat.expectation_sharded(Zu, Fu, mesh)

  if args.process_id == 0:
    np.savez(args.out, Z=Z, F=F, S=S, llk=np.float64(llk),
             LU=LU, RU=RU, tllk=np.float64(tllk))
  print(f"[p{args.process_id}] gmm done, llk={llk:.3f} tllk={tllk:.3f}",
        flush=True)


if __name__ == "__main__":
  sys.exit(main())
