"""Aggregate the betavae4 seed-spread into one table next to the
full-budget run and the published range.

Run after run_seed_spread.py:  python results/fullgrid/spread_summary.py
"""
import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
  rows = []
  full = os.path.join(HERE, "betavae4_fullgrid.json")
  dlib = os.path.join(HERE, "betavae4_dlib.json")
  if os.path.exists(full):
    r = json.load(open(full))
    if os.path.exists(dlib):
      r.update({k: v for k, v in json.load(open(dlib)).items()
                if k.endswith("_dlib")})
    r["seed"] = 1
    r["n_steps"] = r.get("n_steps", 4147200)
    rows.append(r)
  for p in sorted(glob.glob(os.path.join(HERE, "betavae4_seed*_*k.json"))):
    rows.append(json.load(open(p)))
  lr_rows = [json.load(open(p)) for p in sorted(
      glob.glob(os.path.join(HERE, "betavae4lr1e4_seed*_*k.json")))]
  if not rows:
    raise SystemExit("no betavae4 results yet")
  cols = [("betavae_score", "BetaVAE"), ("betavae_score_dlib", "BetaVAE*"),
          ("factorvae_score", "FactorVAE"),
          ("factorvae_score_dlib", "FactorVAE*"),
          ("mig", "MIG"), ("mig_dlib", "MIG*"), ("kl_divergence", "KL")]
  lines = [
      "## BetaVAE(beta=4) seed spread — full 737,280-image grid", "",
      "Starred columns: disentanglement_lib protocol (the published one).",
      "Seed 1 = the full 400-epoch reference budget (4.15M steps); other",
      "seeds = the Locatello 300k-step budget class, trained as ONE",
      "vmapped XLA program (multiseed_device_dataset_steps).", "",
      "| seed | steps | " + " | ".join(h for _, h in cols) + " |",
      "|---|---|" + "---|" * len(cols),
  ]
  for r in rows:
    # seed-spread JSONs store reference-protocol scores with _reference
    # suffix; the full-budget JSON stores them unsuffixed
    def get(k):
      v = r.get(k, r.get(k + "_reference"))
      return f"{v:.3f}" if isinstance(v, (int, float)) else "-"

    lines.append(f"| {r.get('seed', '?')} | {r['n_steps'] / 1e3:.0f}k | " +
                 " | ".join(get(k) for k, _ in cols) + " |")
  if lr_rows:
    lines += [
        "", "### Same seeds, Locatello et al.'s exact optimizer "
        "(constant Adam 1e-4 instead of the reference's 1e-3 exp-decay)",
        "",
        "| seed | steps | " + " | ".join(h for _, h in cols) + " |",
        "|---|---|" + "---|" * len(cols),
    ]
    for r in lr_rows:
      def get(k, r=r):
        v = r.get(k, r.get(k + "_reference"))
        return f"{v:.3f}" if isinstance(v, (int, float)) else "-"
      lines.append(f"| {r.get('seed', '?')} | {r['n_steps'] / 1e3:.0f}k | " +
                   " | ".join(get(k) for k, _ in cols) + " |")
  out = "\n".join(lines)
  with open(os.path.join(HERE, "SPREAD.md"), "w") as f:
    f.write(out + "\n")
  print(out)


if __name__ == "__main__":
  main()
