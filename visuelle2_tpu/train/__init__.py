from visuelle2_tpu.train.optim import adafactor, make_optimizer, partition_trainable
from visuelle2_tpu.train.loop import TrainConfig, Trainer, TrainState, mse_loss
from visuelle2_tpu.train.checkpoint import CheckpointManager

__all__ = [
    "adafactor", "make_optimizer", "partition_trainable",
    "TrainConfig", "Trainer", "TrainState", "mse_loss",
    "CheckpointManager",
]
