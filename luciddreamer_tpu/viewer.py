"""SIBR live-viewer TCP bridge.

Protocol-compatible re-implementation of the reference network GUI
(gaussian_renderer/network_gui.py): length-prefixed JSON camera requests on
127.0.0.1:6009, raw RGB bytes back.  The incoming matrices are the
reference's *transposed* (glm) world_view / view_projection with flipped
y/z columns (network_gui.py:66-71); they are converted to this framework's
plain math convention before rendering.
"""
from __future__ import annotations

import json
import socket
import traceback
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.types import Camera


class ViewerServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host = host
        self.port = port
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self):
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout):
            pass

    def _read(self) -> dict:
        n = int.from_bytes(self._recv_exact(4), "little")
        return json.loads(self._recv_exact(n).decode("utf-8"))

    def _recv_exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def send(self, image_bytes: Optional[bytes], verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    @staticmethod
    def camera_from_message(message: dict) -> Optional[Camera]:
        """Build a renderer Camera from a viewer request
        (network_gui.py:55-79)."""
        W = message["resolution_x"]
        H = message["resolution_y"]
        if W == 0 or H == 0:
            return None
        wvt = np.array(message["view_matrix"], np.float64).reshape(4, 4)
        wvt[:, 1] *= -1
        wvt[:, 2] *= -1
        vpt = np.array(
            message["view_projection_matrix"], np.float64
        ).reshape(4, 4)
        vpt[:, 1] *= -1
        # the viewer sends transposed (glm) matrices; untranspose
        view = wvt.T
        full = vpt.T
        campos = np.linalg.inv(view)[:3, 3]
        return Camera(
            viewmatrix=jnp.asarray(view, jnp.float32),
            projmatrix=jnp.asarray(full, jnp.float32),
            campos=jnp.asarray(campos, jnp.float32),
            tanfovx=jnp.asarray(np.tan(message["fov_x"] / 2), jnp.float32),
            tanfovy=jnp.asarray(np.tan(message["fov_y"] / 2), jnp.float32),
            height=int(H),
            width=int(W),
            znear=float(message["z_near"]),
            zfar=float(message["z_far"]),
        )

    def receive(self):
        """-> (camera | None, request dict)."""
        message = self._read()
        try:
            cam = self.camera_from_message(message)
        except Exception:
            traceback.print_exc()
            raise
        return cam, message

    def serve_once(self, params, bg, render_fn=None, verify: str = "ok"):
        """Handle one request if a viewer is connected: render and reply."""
        if self.conn is None:
            self.try_connect()
        if self.conn is None:
            return False
        try:
            cam, msg = self.receive()
            payload = None
            if cam is not None:
                if render_fn is None:
                    from luciddreamer_tpu.render.tiled import render_tiled

                    out = render_tiled(
                        params, cam, bg,
                        scale_modifier=float(msg.get("scaling_modifier", 1.0)),
                    )
                    img = out["render"]
                else:
                    img = render_fn(params, cam, msg)
                arr = np.asarray(jnp.clip(img, 0.0, 1.0))
                payload = memoryview(
                    (arr.transpose(1, 2, 0) * 255).astype(np.uint8)
                ).tobytes()
            self.send(payload, verify)
            return True
        except (ConnectionError, OSError):
            self.conn = None
            return False

    def close(self):
        if self.conn is not None:
            self.conn.close()
        self.listener.close()
