"""Micro-profile of preprocess/binning internals + candidate optimizations.

Run on real TPU: python profile_micro.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.core import covariance, sh as shlib
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import (
    build_tile_bins, num_tiles_for, gaussian_attr_table,
)

P = 1_000_000
H = W = 512
TILE = 16
CHUNK = 128
PAIR_CAP = 4_000_000

rng = np.random.default_rng(42)
params = GaussianParams(
    xyz=jnp.asarray(rng.normal(size=(P, 3)) + [0, 0, 3.0], jnp.float32),
    features_dc=jnp.asarray(rng.normal(size=(P, 1, 3)) * 0.5, jnp.float32),
    features_rest=jnp.asarray(rng.normal(size=(P, 15, 3)) * 0.1, jnp.float32),
    scaling=jnp.asarray(rng.uniform(-5.5, -3.5, size=(P, 3)), jnp.float32),
    rotation=jnp.asarray(rng.normal(size=(P, 4)), jnp.float32),
    opacity=jnp.asarray(rng.uniform(-2.0, 3.0, size=(P, 1)), jnp.float32),
    alive=jnp.ones(P, bool),
)
cam = make_camera(np.eye(4), 0.8279, 0.8279, W, H)


def timeit(name, fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:36s} {dt*1e3:9.2f} ms")
    return out


# ---------------- preprocess pieces ----------------
@jax.jit
def pre_cov3d(p):
    return covariance.build_cov3d(p.get_scaling(), p.get_rotation())


@jax.jit
def pre_proj2d(p, cov3d):
    return covariance.project_cov3d_to_2d(
        p.xyz, cov3d, cam.viewmatrix, cam.focal_x, cam.focal_y,
        cam.tanfovx, cam.tanfovy)


@jax.jit
def pre_sh(p):
    return shlib.sh_to_rgb_clamped(3, p.get_features(), p.xyz, cam.campos)


@jax.jit
def pre_acts(p):
    return p.get_scaling(), p.get_rotation(), p.get_opacity(), p.get_features()


@jax.jit
def pre_full(p):
    return preprocess_gaussians(p, cam, 3, TILE, 1.0)


# ---------------- binning pieces ----------------
proc_const = jax.jit(lambda p: preprocess_gaussians(p, cam, 3, TILE, 1.0))(params)
proc_const = jax.block_until_ready(proc_const)
grid_x, grid_y = num_tiles_for(H, W, TILE)
num_tiles = grid_x * grid_y


def expand(proc):
    counts = proc.tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts
    marks = jnp.zeros((PAIR_CAP,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, P - 1)
    slot = jnp.arange(PAIR_CAP, dtype=jnp.int32)
    slot_valid = slot < total
    rect = jnp.concatenate([proc.rect_min, proc.rect_max], axis=-1)
    rect_g = rect[g]
    local = slot - offsets[g]
    rw = jnp.maximum(rect_g[:, 2] - rect_g[:, 0], 1)
    tx = rect_g[:, 0] + local % rw
    ty = rect_g[:, 1] + local // rw
    tile = jnp.where(slot_valid, ty * grid_x + tx, num_tiles)
    return tile, g, total


@jax.jit
def bin_expand(proc):
    return expand(proc)


@jax.jit
def bin_sort2key(proc):
    tile, g, total = expand(proc)
    depth = proc.depth[g].astype(jnp.float32)
    return jax.lax.sort((tile, depth, g), num_keys=2, is_stable=True)


@jax.jit
def bin_sort_u32(proc):
    tile, g, total = expand(proc)
    # depth-rank trick: 1M argsort by depth once, pairs get unique u32 keys
    order = jnp.argsort(proc.depth)                       # (P,)
    rank = jnp.zeros((P,), jnp.int32).at[order].set(
        jnp.arange(P, dtype=jnp.int32))
    key = tile.astype(jnp.uint32) * jnp.uint32(1 << 20) + rank[g].astype(jnp.uint32)
    return jax.lax.sort((key, g), num_keys=1, is_stable=False)


@jax.jit
def sort_depth_only(proc):
    return jnp.argsort(proc.depth)


@jax.jit
def bin_full(proc):
    return build_tile_bins(proc, H, W, TILE, PAIR_CAP, CHUNK)


bins_const = jax.block_until_ready(bin_full(proc_const))


@jax.jit
def attr_gather(proc, gid):
    return gaussian_attr_table(proc)[gid]


@jax.jit
def attr_scatter_add(dattrs, gid):
    return jnp.zeros((P + 1, 16), jnp.float32).at[gid].add(dattrs)


@jax.jit
def seg_sum_sorted(dattrs, gid):
    # gid sorted by gid: segment_sum on sorted ids
    return jax.ops.segment_sum(dattrs, gid, num_segments=P + 1,
                               indices_are_sorted=False)


print("== preprocess pieces ==")
timeit("activations only", pre_acts, params)
cov3d = timeit("build_cov3d", pre_cov3d, params)
timeit("project_cov3d_to_2d", pre_proj2d, params, cov3d)
timeit("sh_to_rgb (deg3)", pre_sh, params)
timeit("preprocess full", pre_full, params)

print("== binning pieces ==")
timeit("expand pairs (scatter+cumsum)", bin_expand, proc_const)
timeit("expand + 2key stable sort", bin_sort2key, proc_const)
timeit("depth argsort (1M)", sort_depth_only, proc_const)
timeit("expand + u32 single sort", bin_sort_u32, proc_const)
timeit("binning full", bin_full, proc_const)

print("== gather/scatter at pair scale ==")
padded_gid = bins_const.gid
timeit("attr table row-gather (4.2M x 16)", attr_gather, proc_const, padded_gid)
dattrs = jnp.ones_like(bins_const.attrs)
timeit("scatter-add VJP (4.2M x 16)", attr_scatter_add, dattrs, padded_gid)
timeit("segment_sum (4.2M x 16)", seg_sum_sorted, dattrs, padded_gid)
