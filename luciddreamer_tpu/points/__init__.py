from luciddreamer_tpu.points.knn import mean_sq_dist_3nn

__all__ = ["mean_sq_dist_3nn"]
