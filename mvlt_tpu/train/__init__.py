from mvlt_tpu.train.losses import compute_losses
from mvlt_tpu.train.schedule import make_lr_schedule, scaled_base_lr
from mvlt_tpu.train.state import TrainState, create_train_state
from mvlt_tpu.train.step import make_train_step, make_eval_step

__all__ = [
    "compute_losses", "make_lr_schedule", "scaled_base_lr",
    "TrainState", "create_train_state", "make_train_step", "make_eval_step",
]
