from luciddreamer_tpu.scene.scene import Scene, TrainView, load_camera_json

__all__ = ["Scene", "TrainView", "load_camera_json"]
