"""Training: schedulers, optimizers, checkpointing, lifecycle, train step."""

from .checkpoint import Checkpoint, Checkpointer, average_checkpoints
from .lifecycle import EpochCounter, Pretrainer, Stage
from .optim import Adam, AdamW, OptimizerFactory
from .schedulers import NoamScheduler, WarmCoolDecayLRSchedule

__all__ = [
    "Checkpoint", "Checkpointer", "average_checkpoints", "EpochCounter",
    "Pretrainer", "Stage", "Adam", "AdamW", "OptimizerFactory",
    "NoamScheduler", "WarmCoolDecayLRSchedule",
]
