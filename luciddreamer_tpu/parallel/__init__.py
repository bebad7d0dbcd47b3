from luciddreamer_tpu.parallel.sharded import (
    make_mesh,
    render_sharded,
    render_sharded_batch,
    sharded_loss_fn,
    sharded_train_step,
    sharded_train_step_batch,
)
from luciddreamer_tpu.parallel.trainer import ShardedTrainer

__all__ = [
    "ShardedTrainer",
    "make_mesh",
    "render_sharded",
    "render_sharded_batch",
    "sharded_loss_fn",
    "sharded_train_step",
    "sharded_train_step_batch",
]
