"""Op-level device profile of the MXU-bound train step (round 3).

Captures a `jax.profiler` trace of one 200-step fused call of the
batch-128 device-resident bf16-matmul config (bench.py's `run_mxu_config`
operating point) and prints the device-time breakdown by category —
convolutions (forward / filter-grad / input-grad), layout copies,
reduces, RNG, nan-check, transcendentals.

This is the measurement behind the BASELINE.md "Train-step profile"
table: the objective's elementwise work (sampling/KL/log_prob) is fused
into the conv kernels by XLA and costs <5%; convs are ~88% of the step.

Run on the TPU:  python benchmarks/train_step_profile.py
"""
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def capture(scan_steps: int = 200, batch: int = 128,
            n_images: int = 16384, width: int = 1, compute_dtype=None,
            remat=False):
  import jax

  from odin_tpu import parallel
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks
  from odin_tpu.training.core import device_dataset_steps

  logdir = tempfile.mkdtemp(prefix="odin_profile_")
  with jax.default_matmul_precision("bfloat16"):
    vae = BetaVAE(beta=1.0,
                  **get_networks("dsprites", zdim=10,
                                 width=width)).build(seed=1)
    raw = vae.make_step_fn(learning_rate=1e-3, jit=False,
                           compute_dtype=compute_dtype, remat=remat)
    data = jax.device_put(
        (np.random.RandomState(1).rand(n_images, 64, 64, 1) < 0.5)
        .astype("f"))
    state = parallel.replicate(vae.state)
    fused = jax.jit(device_dataset_steps(raw, batch, scan_steps, seed=0),
                    donate_argnums=(0,))
    compiled = fused.lower(state, data).compile()
    hlo = compiled.as_text()
    state, m = compiled(state, data)
    jax.block_until_ready(m)
    jax.profiler.start_trace(logdir)
    state, m = compiled(state, data)
    jax.block_until_ready(m)
    jax.profiler.stop_trace()
  traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                     recursive=True)
  return traces[0], hlo


def categorize(trace_path: str, hlo: str):
  data = json.load(gzip.open(trace_path))
  # find the TPU device pid
  pids = {e["pid"]: e["args"].get("name", "")
          for e in data["traceEvents"]
          if e.get("ph") == "M" and e.get("name") == "process_name"}
  dev = [p for p, n in pids.items() if "TPU" in n]
  assert dev, f"no TPU lane in trace: {pids}"
  durs = collections.Counter()
  for e in data["traceEvents"]:
    if e.get("ph") == "X" and e.get("pid") == dev[0]:
      durs[e["name"]] += e.get("dur", 0)
  # drop container events (the jit call + the scan while)
  for k in list(durs):
    if k in ("0",) or k.startswith("jit_") or k.startswith("while"):
      durs.pop(k)

  def body_of(name):
    m = re.search(rf"%{re.escape(name)} = ([^\n]+)", hlo)
    if not m:
      return None
    line = m.group(1)
    calls = re.search(r"calls=%([\w.\-]+)", line)
    if not calls:
      return line
    cm = re.search(rf"%{re.escape(calls.group(1))} [^\n]*\{{(.*?)\n\}}",
                   hlo, re.S)
    return cm.group(1) if cm else line

  cats = collections.Counter()
  for name, dur in durs.items():
    body = body_of(name)
    if body is None:
      cat = "other/unmapped"
    elif "convolution" in body:
      if "rhs_dilate" in body:
        cat = "conv: filter-grad"
      elif "lhs_dilate" in body:
        cat = "conv: input-grad/transposed"
      else:
        cat = "conv: forward"
    elif " dot(" in body:
      cat = "dense matmul"
    elif "shift-left" in body and ("xor" in body or "iota" in body):
      cat = "rng/threefry"
    elif "is-finite" in body:
      cat = "nan-check (standalone)"
    elif "exponential" in body or "log(" in body:
      cat = "elementwise transcendental"
    elif "reduce(" in body:
      cat = "reduce"
    elif "copy" in name or "reverse" in name or "bitcast" in name:
      cat = "layout/copy"
    elif "gather" in body or "dynamic" in name:
      cat = "gather/dynamic-slice"
    else:
      cat = "elementwise other"
    cats[cat] += dur
  return cats


def main():
  import argparse
  import jax.numpy as jnp
  ap = argparse.ArgumentParser()
  ap.add_argument("--width", type=int, default=1,
                  help="trunk width multiplier (4 = the production-width "
                       "44.6%%-MFU point, VERDICT r3 weak #4)")
  ap.add_argument("--batch", type=int, default=128)
  ap.add_argument("--compute-dtype", choices=["f32", "bf16"], default="f32")
  ap.add_argument("--remat", action="store_true")
  ap.add_argument("--json", default="",
                  help="append the category table to this JSON file")
  args = ap.parse_args()
  trace, hlo = capture(
      batch=args.batch, width=args.width,
      compute_dtype=jnp.bfloat16 if args.compute_dtype == "bf16" else None,
      remat=args.remat)
  cats = categorize(trace, hlo)
  tot = sum(cats.values())
  tag = (f"width={args.width} batch={args.batch} "
         f"dtype={args.compute_dtype} remat={args.remat}")
  print(f"[{tag}] device op time per 200-step call: {tot / 1e3:.1f} ms")
  for cat, dur in cats.most_common():
    print(f"{dur / 1e3:9.1f} ms {100 * dur / tot:5.1f}%  {cat}")
  conv = sum(v for k, v in cats.items() if k.startswith("conv"))
  print(f"\nconvolutions: {100 * conv / tot:.1f}% of device time")
  if args.json:
    row = dict(config=tag, total_ms=round(tot / 1e3, 1),
               categories={k: round(v / 1e3, 1)
                           for k, v in cats.most_common()})
    rows = []
    if os.path.exists(args.json):
      rows = json.load(open(args.json))
    rows.append(row)
    with open(args.json, "w") as f:
      json.dump(rows, f, indent=1)
  return cats


if __name__ == "__main__":
  main()
