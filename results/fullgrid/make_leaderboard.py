"""Assemble the full-grid leaderboard (results/fullgrid/README.md) from the
per-model JSONs written by results/run_r4_fullgrid.py and
results/run_r4_shapes3d.py (plus the retroactive protocol re-evals written
by eval_dlib_protocol.py / reeval_dlib_r5.py).

Run after the queue completes:  python results/fullgrid/make_leaderboard.py
"""
import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
ORDER = ["betavae4", "betavae8", "factorvae", "adagvae"]
ORDER_S3D = ["betavae4_shapes3d", "factorvae_shapes3d", "adagvae_shapes3d"]
# reference-protocol columns (the reference's own kernels/defaults) and
# dlib-protocol columns (disentanglement_lib's published protocol)
COLS = [("betavae_score", "BetaVAE"), ("betavae_score_dlib", "BetaVAE*"),
        ("factorvae_score", "FactorVAE"),
        ("factorvae_score_dlib", "FactorVAE*"),
        ("mig", "MIG"), ("mig_dlib", "MIG*"), ("sap", "SAP"),
        ("dci_disentanglement", "DCI-dis"),
        ("log_likelihood", "llk"), ("kl_divergence", "KLobj"),
        ("kl_unweighted", "rate"),
        ("n_active_units", "AU")]
LABELS = {"betavae4": "BetaVAE (beta=4)", "betavae8": "BetaVAE (beta=8)",
          "factorvae": "FactorVAE (tc=35)", "adagvae": "Ada-GVAE",
          "betavae4_shapes3d": "BetaVAE (beta=4)",
          "factorvae_shapes3d": "FactorVAE (tc=7)",
          "adagvae_shapes3d": "Ada-GVAE"}


def table(rows, order):
  lines = [
      "| model | " + " | ".join(h for _, h in COLS) +
      " | steps | steps/s | train h |",
      "|---|" + "---|" * (len(COLS) + 3),
  ]
  for m in order:
    if m not in rows:
      continue
    r = rows[m]
    cells = [f"{r[k]:.3f}" if isinstance(r.get(k), (int, float))
             else "-" for k, _ in COLS]
    lines.append(
        f"| {LABELS[m]} | " + " | ".join(cells) +
        f" | {r['n_steps'] / 1e6:.2f}M | {r.get('steps_per_sec', 0):.0f} "
        f"| {r.get('train_wallclock_sec', 0) / 3600:.1f} |")
  return lines


def s3d_spread_lines(rows):
  """FactorVAE Shapes3D seed-spread section (round-5 session 2,
  run_shapes3d_spread.py) — emitted from the per-seed JSONs so
  regenerating the leaderboard keeps the study."""
  seeds = []
  for p in sorted(glob.glob(os.path.join(
      HERE, "factorvae_shapes3d_seed*_300k.json"))):
    seeds.append(json.load(open(p)))
  if not seeds:
    return []
  lines = [
      "", "### FactorVAE(tc=7) Shapes3D seed spread (round-5 session 2, "
      "`run_shapes3d_spread.py`)", "",
      "The FactorVAE Shapes3D row above is a single seed at "
      "0.760 FactorVAE* — inside but below the published Shapes3D median "
      "(~0.8+).  Three additional seeds at the Locatello 300k-step budget "
      "class (batch 128 = 38.4M train images), all trained as ONE vmapped "
      "XLA program (437 model-steps/s aggregate — three adversarial "
      "two-optimizer models in a single fused scan):", "",
      "| seed | steps | BetaVAE* | FactorVAE* | MIG* | rate |",
      "|---|---|---|---|---|---|",
  ]
  fb = rows.get("factorvae_shapes3d")
  if fb:
    lines.append(
        f"| 1 (full budget) | {fb['n_steps'] / 1e6:.2f}M "
        f"| {fb['betavae_score_dlib']:.3f} "
        f"| {fb['factorvae_score_dlib']:.3f} | {fb['mig_dlib']:.3f} "
        f"| {fb['kl_unweighted']:.1f} |")
  for r in seeds:
    lines.append(
        f"| {r['seed']} | {r['n_steps'] // 1000}k "
        f"| {r['betavae_score_dlib']:.3f} "
        f"| {r['factorvae_score_dlib']:.3f} | {r['mig_dlib']:.3f} "
        f"| {r['kl_unweighted']:.1f} |")
  lines += [
      "",
      "Reading: (a) the 300k-budget seeds cluster tightly (FactorVAE* "
      "0.635-0.685) — seed randomness does NOT explain the gap to the "
      "published median, exactly as the dSprites beta-VAE seed study "
      "found for that recipe; (b) budget matters — the full-budget run "
      "(4.5x the images) beats all three 300k seeds on every starred "
      "metric, so part of the remaining gap is training budget; (c) the "
      "established attribution mechanism from the dSprites "
      "discriminating experiment (the reference's elu trunk confines "
      "scores; disentanglement_lib's ReLU trunk restores the published "
      "spread — SPREAD.md) is the prime suspect here too, since these "
      "runs use the reference's elu Shapes3D trunk, though the "
      "trunk-swap run was not repeated on Shapes3D; (d) the harness "
      "control stands — Ada-GVAE reaches its published Shapes3D "
      "headline (FactorVAE* 0.910, MIG* 0.505) through the same data, "
      "loop, and kernels.",
  ]
  return lines


def main():
  rows = {}
  for p in glob.glob(os.path.join(HERE, "*_fullgrid.json")):
    r = json.load(open(p))
    rows[r["model"]] = r
  # retroactive dlib-protocol re-evals (betavae4 trained before the runner
  # recorded both protocols inline)
  for p in glob.glob(os.path.join(HERE, "*_dlib.json")):
    r = json.load(open(p))
    m = r["model"]
    if m in rows:
      for k in ("betavae_score_dlib", "factorvae_score_dlib", "mig_dlib",
                "kl_unweighted", "elbo_unweighted"):
        if rows[m].get(k) is None and r.get(k) is not None:
          rows[m][k] = r[k]
  if not rows:
    raise SystemExit("no *_fullgrid.json yet")
  lines = [
      "# Full-grid leaderboards: dSprites (round 4) + Shapes3D (round 5)",
      "",
      "The reference's actual benchmark protocol on BOTH canonical "
      "datasets: the complete factor grid, uint8 device-resident, 90/5/5 "
      "split, the reference budget "
      "(`odin/networks/image_networks.py:936-1013`), 10,000 held-out "
      "images scored by the DisentanglementGym.", "",
      "Unstarred columns use the REFERENCE'S own metric kernels and "
      "defaults (`odin/bay/vi/downstream_metrics.py:399,431`: 10 MCMC "
      "samples of z, pair batches of 10, 2k votes, 8-bin MIG).  Starred "
      "columns (`*`) use disentanglement_lib's protocol — the one behind "
      "every published number: posterior MEAN representation, pair batches "
      "of 64, 10,000 train votes scored on 5,000 HELD-OUT eval votes "
      "(round 5; round-4 train-vote accuracies preserved as "
      "`*_dlib_trainacc` in the JSONs), std<0.05 pruning, 20-bin MIG.  "
      "The same representation scores very differently under the two (see "
      "`eval_dlib_protocol.py`); published ranges are only comparable to "
      "the starred columns.", "",
      "`KLobj` is the OBJECTIVE's KL-side term (beta-scaled for BetaVAE; "
      "includes the tc_coef*TC penalty for FactorVAE); `rate` is the "
      "unweighted analytic KL(q(z|x)||p(z)) — the number published ELBO/"
      "KL tables report (gym.kl_unweighted).", "",
      "## dSprites — 737,280-image grid, 400 epochs = 265.4M train images",
      "",
  ]
  lines += table(rows, ORDER)
  if any(m in rows for m in ORDER_S3D):
    lines += [
        "",
        "## Shapes3D — 480,000-image grid, 400 epochs = 172.8M train "
        "images (round 5; procedural stand-in renderer, see "
        "`fuel/image_data/datasets.py`)",
        "",
    ]
    lines += table(rows, ORDER_S3D)
    lines += s3d_spread_lines(rows)
  lines += [
      "", "Published full-dSprites ranges for these recipes under the "
      "dlib protocol (Locatello et al. 2019/2020): FactorVAE-score "
      "0.6-0.85, MIG 0.1-0.35 for beta=4-class models (with single-seed "
      "spread covering 0.4-0.95 / 0.0-0.35); Ada-GVAE FactorVAE-score "
      "~0.9, MIG ~0.3-0.55.  Published Shapes3D ranges: FactorVAE-score "
      "~0.8-1.0, MIG ~0.2-0.6 for beta/Factor-VAE-class models; Ada-GVAE "
      "FactorVAE-score ~0.95+, MIG ~0.55+.", "",
      "Measurement-path control (tests/test_fullgrid_control.py): the "
      "ground-truth factors fed through the same kernels on the same test "
      "partition score 1.0 on BetaVAE/FactorVAE metrics, and re-rendering "
      "the partition labels reproduces the stored images bit-exactly — so "
      "sub-published model scores are properties of the learned "
      "representation and the evaluation protocol, not the harness.", "",
      "Per-model reports/traversals: `<model>_report.txt`, "
      "`<model>_traverse.png`, `<model>_correlation.png`.  Smoke-protocol "
      "artifacts (400 steps) live in `smoke_r4/`.", "",
  ]
  out = os.path.join(HERE, "README.md")
  with open(out, "w") as f:
    f.write("\n".join(lines))
  print("\n".join(lines))


if __name__ == "__main__":
  main()
