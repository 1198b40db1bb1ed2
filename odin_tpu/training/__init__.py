"""Training loop & experiment management (reference: ``odin/training``)."""
from odin_tpu.training.core import (
    TrainState,
    TrainStep,
    build_train_step_fn,
    make_optimizer,
)
from odin_tpu.training.callbacks import BestWeights, early_stopping_callback
from odin_tpu.training.early_stopping import EarlyStopping
from odin_tpu.training.experimenter import (
    get_output_dir,
    hash_config,
    parse_config,
    run_hydra,
)
from odin_tpu.training.scores import ScoreBoard
from odin_tpu.training.trainer import Trainer, get_current_trainer
