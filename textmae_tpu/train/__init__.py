"""Training infrastructure: dual optimizers, jitted steps, checkpoints, logging."""
from textmae_tpu.train.optim import configure_optimizers
from textmae_tpu.train.state import TrainState
from textmae_tpu.train.step import make_eval_step, make_train_step
from textmae_tpu.train.logger import MetricLogger, SmoothedValue

__all__ = [
    "configure_optimizers",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "MetricLogger",
    "SmoothedValue",
]
