from patch2pix_tpu.train.losses import patch2pix_losses
from patch2pix_tpu.train.state import (
    TrainState,
    create_train_state,
    lr_schedule,
    make_optimizer,
)
from patch2pix_tpu.train.step import (
    make_sharded_train_step,
    make_train_step,
    shard_batch_spec,
)

__all__ = [
    "patch2pix_losses",
    "TrainState",
    "create_train_state",
    "lr_schedule",
    "make_optimizer",
    "make_train_step",
    "make_sharded_train_step",
    "shard_batch_spec",
]
