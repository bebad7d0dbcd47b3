from luciddreamer_tpu.parallel.sharded import (
    make_mesh,
    render_sharded,
    render_sharded_batch,
    sharded_loss_fn,
    sharded_train_step,
    sharded_train_step_batch,
)
from luciddreamer_tpu.parallel.trainer import ShardedTrainer
from luciddreamer_tpu.parallel.overlap import (
    ring_all_reduce,
    sharded_train_step_overlapped,
)

__all__ = [
    "ShardedTrainer",
    "ring_all_reduce",
    "sharded_train_step_overlapped",
    "make_mesh",
    "render_sharded",
    "render_sharded_batch",
    "sharded_loss_fn",
    "sharded_train_step",
    "sharded_train_step_batch",
]
