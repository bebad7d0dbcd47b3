from luciddreamer_tpu.model.gaussians import (
    create_from_pcd,
    reset_opacity,
    DensifyStats,
    densify_and_prune,
    add_densification_stats,
)
from luciddreamer_tpu.model.optim import AdamState, adam_init, adam_update, xyz_lr_schedule
from luciddreamer_tpu.model import ply

__all__ = [
    "create_from_pcd",
    "reset_opacity",
    "DensifyStats",
    "densify_and_prune",
    "add_densification_stats",
    "AdamState",
    "adam_init",
    "adam_update",
    "xyz_lr_schedule",
    "ply",
]
