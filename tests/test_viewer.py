"""Viewer TCP bridge: protocol round-trip against a fake SIBR client."""
import json
import socket
import threading

import numpy as np
import jax.numpy as jnp
import pytest

from luciddreamer_tpu.viewer import ViewerServer
from tests.helpers import make_random_gaussians, make_test_camera


def _send_msg(sock, msg: dict):
    data = json.dumps(msg).encode()
    sock.sendall(len(data).to_bytes(4, "little"))
    sock.sendall(data)


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        buf += sock.recv(n - len(buf))
    return buf


def test_viewer_round_trip(rng):
    server = ViewerServer(port=0)            # wait, port 0 -> pick free
    host, port = server.listener.getsockname()
    params = make_random_gaussians(30, rng)
    bg = jnp.zeros(3)

    # a viewer request mimicking SIBR: reference camera matrices transposed
    # with y/z flips pre-applied the way network_gui expects to undo them
    cam = make_test_camera(32, 32)
    view = np.asarray(cam.viewmatrix)
    full = np.asarray(cam.projmatrix)
    wvt = view.T.copy()
    wvt[:, 1] *= -1
    wvt[:, 2] *= -1
    vpt = full.T.copy()
    vpt[:, 1] *= -1
    msg = {
        "resolution_x": 32, "resolution_y": 32,
        "train": False, "fov_x": 0.8279, "fov_y": 0.8279,
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": True, "scaling_modifier": 1.0,
        "view_matrix": wvt.reshape(-1).tolist(),
        "view_projection_matrix": vpt.reshape(-1).tolist(),
    }

    result = {}

    def client():
        s = socket.create_connection((host, port))
        _send_msg(s, msg)
        img = _recv_exact(s, 32 * 32 * 3)
        vlen = int.from_bytes(_recv_exact(s, 4), "little")
        verify = _recv_exact(s, vlen).decode()
        result["img"] = np.frombuffer(img, np.uint8).reshape(32, 32, 3)
        result["verify"] = verify
        s.close()

    t = threading.Thread(target=client)
    t.start()
    handled = False
    for _ in range(200):
        if server.serve_once(params, bg, verify="ok"):
            handled = True
            break
    t.join(timeout=10)
    server.close()
    assert handled
    assert result["verify"] == "ok"
    # the recovered camera equals the original -> render matches direct call
    from luciddreamer_tpu.render.tiled import render_tiled

    ref = render_tiled(params, cam, bg)["render"]
    ref8 = (np.clip(np.asarray(ref), 0, 1).transpose(1, 2, 0) * 255).astype(
        np.uint8
    )
    np.testing.assert_array_equal(result["img"], ref8)
