"""Camera-path JSON export (the reference's utils/trajectory.py main(),
:537-616, which generated the shipped cameras/*.json presets).

Writes the same Blender-style schema the loaders consume:
{"camera_angle_x": fov, "frames": [{"transform_matrix": 4x4 c2w}, ...]}.
"""
from __future__ import annotations

import json
import os

import numpy as np

from luciddreamer_tpu.trajectory import poses as P
from luciddreamer_tpu.trajectory.poses import w2c_pose_to_c2w

# name -> (generator, kwargs); mirrors the preset sweep of main()
EXPORTABLE = {
    "back_and_forth": (P.back_and_forth, {}),
    "llff": (P.llff, dict(degree=5, n_views=400, rounds=4, d=2)),
    "headbanging": (P.headbanging, dict(maxdeg=15, n_views_per_round=180,
                                        rounds=2, fullround=0)),
    "rotate360": (P.rotate360, dict(viewangle=360.0, n_views=10)),
    "lookaround": (P.lookaround, {}),
    "lookdown": (P.lookdown, {}),
    "moveright": (P.moveright, {}),
    "moveback": (P.moveback, {}),
    "hemisphere": (P.hemisphere, dict(center_depth=4.3)),
}


def export_camera_json(name: str, path: str,
                       camera_angle_x: float = 0.8279) -> str:
    gen, kw = EXPORTABLE[name]
    frames = [
        {"transform_matrix": w2c_pose_to_c2w(p).tolist()}
        for p in gen(**kw)
    ]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
    return path


def export_all(outdir: str, camera_angle_x: float = 0.8279) -> list[str]:
    return [
        export_camera_json(name, os.path.join(outdir, f"{name}.json"),
                           camera_angle_x)
        for name in EXPORTABLE
    ]
