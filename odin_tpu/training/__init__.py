"""Training loop & experiment management (reference: ``odin/training``)."""
from odin_tpu.training.core import (
    TrainState,
    TrainStep,
    build_train_step_fn,
    make_optimizer,
    use_ema_params,
)
from odin_tpu.training.callbacks import (BestWeights, Callback,
                                         early_stopping_callback)
from odin_tpu.training.early_stopping import (EarlyStopping,
    exponential_moving_average)
from odin_tpu.training.experimenter import (
    get_output_dir,
    hash_config,
    parse_config,
    run_hydra,
)
from odin_tpu.training.scores import ScoreBoard
from odin_tpu.training.trainer import Trainer, get_current_trainer


def read_tensorboard(logdir: str):
  """Parse a run's logged scalars back as {tag: [(step, value), ...]}
  (reference ``trainer.py:135-173``; here the system of record is
  log.jsonl, with TensorBoard events written alongside when TF exists)."""
  import json
  import os
  out = {}
  path = os.path.join(logdir, "log.jsonl")
  with open(path) as f:
    for line in f:
      row = json.loads(line)
      step = row.get("step", len(out))
      for k, v in row.items():
        if k in ("step", "time") or not isinstance(v, (int, float)):
          continue
        out.setdefault(k, []).append((int(step), float(v)))
  return out
