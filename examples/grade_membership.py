"""Grade-of-Membership questionnaire modelling (reference:
``odin/bay/mixed_membership/grade_membership_model.py``).

Synthetic answer sheets are generated from K latent respondent profiles
(each profile fixes one answer per question, with label noise); the model
recovers per-respondent profile memberships and reconstructs held-out
sheets far above chance.

Run: ``python examples/grade_membership.py n_components=3 max_iter=600``
"""
import numpy as np

from odin_tpu.bay.mixed_membership import GradeMembershipModel
from odin_tpu.training import run_hydra

CONFIG = dict(n_sheets=2000, n_questions=12, n_answers=5, n_components=3,
              noise=0.1, max_iter=600, lr=2e-2, warmup=200)


@run_hydra(output_dir="./results/gom", config=CONFIG)
def main(cfg):
  rng = np.random.RandomState(0)
  Q, A, K = cfg.n_questions, cfg.n_answers, cfg.n_components
  # planted profiles: profile k answers question q with (k * 2 + q) % A
  profiles = (2 * np.arange(K)[:, None] + np.arange(Q)[None, :]) % A
  members = rng.randint(0, K, size=cfg.n_sheets)
  answers = profiles[members]
  noise = rng.rand(cfg.n_sheets, Q) < cfg.noise
  answers = np.where(noise, rng.randint(0, A, size=answers.shape), answers)
  n_train = int(0.9 * cfg.n_sheets)

  model = GradeMembershipModel(n_questions=Q, n_answers=A, n_components=K,
                               warmup_steps=cfg.warmup).build(seed=0)
  # entire corpus device-resident, batches sampled on-device
  model.fit_device_dataset(answers[:n_train].astype("float32"),
                           n_steps=cfg.max_iter, batch_size=256,
                           learning_rate=cfg.lr, steps_per_call=100)

  test = answers[n_train:]
  pred = model.predict(test)
  acc = float(np.mean(pred == test))
  # do recovered memberships separate the planted groups?
  theta = model.transform(test)
  purity = 0.0
  for k in np.unique(theta.argmax(-1)):
    labels = members[n_train:][theta.argmax(-1) == k]
    if len(labels):
      purity += np.max(np.bincount(labels, minlength=K))
  purity /= len(test)
  print(f"held-out answer reconstruction acc={acc:.3f} (chance {1 / A:.2f}); "
        f"membership cluster purity={purity:.3f} (chance ~{1 / K:.2f})")
  return dict(accuracy=acc, purity=float(purity))


if __name__ == "__main__":
  main()
