"""Training engine: jitted steps, optimizer, epoch loop."""

from dl_vqa_tpu.train.state import TrainState, create_train_state
from dl_vqa_tpu.train.steps import make_eval_step, make_optimizer, make_train_step
from dl_vqa_tpu.train.loop import TrainParams, evaluate, train

__all__ = [
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "TrainParams",
    "evaluate",
    "train",
]
