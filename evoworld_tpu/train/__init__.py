from evoworld_tpu.train.train_step import (
    TrainConfig,
    make_train_state,
    make_sharded_train_step,
    edm_loss,
    trainable_mask,
)

__all__ = [
    "TrainConfig",
    "make_train_state",
    "make_sharded_train_step",
    "edm_loss",
    "trainable_mask",
]
