"""Failure-detection / debug snapshots.

Counterpart of the reference's debug machinery: the rasterizer wrapper's
snapshot_fw/bw.dump on CUDA exceptions
(depth_diff_gaussian_rasterization_min/__init__.py:83-90,133-140) and the
CHECK_CUDA sync macro.  JAX is deterministic and raises cleanly, so the
failure mode to guard is numerics: ``check_finite`` validates a pytree and
``snapshot_on_nan`` dumps the offending inputs as an npz for offline
inspection.
"""
from __future__ import annotations

import os
import time

import numpy as np
import jax


class NonFiniteError(RuntimeError):
    def __init__(self, bad: list[str], snapshot_path: str | None):
        self.bad_leaves = bad
        self.snapshot_path = snapshot_path
        msg = f"non-finite values in: {', '.join(bad)}"
        if snapshot_path:
            msg += f" (snapshot: {snapshot_path})"
        super().__init__(msg)


def find_nonfinite(tree) -> list[str]:
    """Names of leaves containing NaN/inf (floating leaves only)."""
    bad = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    return bad


def snapshot(tree, outdir: str, tag: str = "snapshot") -> str:
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, f"{tag}_{int(time.time())}.npz")
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    np.savez_compressed(
        path,
        **{jax.tree_util.keystr(p).strip("[]'\"").replace("']['", "/"):
           np.asarray(l) for p, l in flat},
    )
    return path


def check_finite(tree, outdir: str | None = None, tag: str = "snapshot"):
    """Raise NonFiniteError (with an npz dump if ``outdir``) when any
    floating leaf contains NaN/inf."""
    bad = find_nonfinite(tree)
    if bad:
        path = snapshot(tree, outdir, tag) if outdir else None
        raise NonFiniteError(bad, path)
