from luciddreamer_tpu.train.losses import l1_loss, l2_loss, ssim, psnr, near_mean_map
from luciddreamer_tpu.train.loop import Trainer, TrainState

__all__ = ["l1_loss", "l2_loss", "ssim", "psnr", "near_mean_map",
           "Trainer", "TrainState"]
