from luciddreamer_tpu.parallel.sharded import (
    make_mesh,
    render_sharded,
    render_sharded_batch,
    sharded_loss_fn,
    sharded_train_step,
    sharded_train_step_batch,
)

__all__ = [
    "make_mesh",
    "render_sharded",
    "render_sharded_batch",
    "sharded_loss_fn",
    "sharded_train_step",
    "sharded_train_step_batch",
]
