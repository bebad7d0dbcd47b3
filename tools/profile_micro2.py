"""Round 2 micro-profile: dispatch overhead, candidate optimizations."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.binning import build_tile_bins, num_tiles_for

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
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return out


proc = jax.block_until_ready(
    jax.jit(lambda p: preprocess_gaussians(p, cam, 3, TILE, 1.0))(params))
bins = jax.block_until_ready(
    jax.jit(lambda pr: build_tile_bins(pr, H, W, TILE, PAIR_CAP, CHUNK))(proc))
grid_x, grid_y = num_tiles_for(H, W, TILE)
num_tiles = grid_x * grid_y

x_small = jnp.ones((8,), jnp.float32)
x_big = jnp.ones((4_000_000,), jnp.float32)
xi_big = jnp.ones((4_000_000,), jnp.int32)
x2d = jnp.ones((4_194_304, 16), jnp.float32)

print("== dispatch calibration ==")
timeit("jit x+1 (8,)", jax.jit(lambda x: x + 1.0), x_small, reps=30)
timeit("jit x+1 (4M,)", jax.jit(lambda x: x + 1.0), x_big, reps=30)
timeit("jit x*2+1 (4.2M,16)", jax.jit(lambda x: x * 2 + 1.0), x2d, reps=30)
timeit("cumsum f32 (4M,)", jax.jit(jnp.cumsum), x_big)
timeit("cumsum i32 (4M,)", jax.jit(jnp.cumsum), xi_big)
timeit("cumsum f32 (4.2M,16) ax0", jax.jit(lambda x: jnp.cumsum(x, 0)), x2d)

print("== int div/mod vs float ==")
local = jnp.abs(jax.random.randint(jax.random.PRNGKey(0), (4_000_000,), 0, 4000))
rw = jax.random.randint(jax.random.PRNGKey(1), (4_000_000,), 1, 63)


@jax.jit
def divmod_int(local, rw):
    return local % rw, local // rw


@jax.jit
def divmod_float(local, rw):
    q = (local.astype(jnp.float32) * (1.0 / rw.astype(jnp.float32))).astype(jnp.int32)
    return local - q * rw, q


timeit("int %,// (4M)", divmod_int, local, rw)
timeit("float divmod (4M)", divmod_float, local, rw)
d_i, d_f = divmod_int(local, rw), divmod_float(local, rw)
print("   float divmod exact:", bool(jnp.all(d_i[0] == d_f[0]) & jnp.all(d_i[1] == d_f[1])))

print("== scatter/segment variants (the 443ms VJP) ==")
dattrs = jnp.asarray(rng.normal(size=bins.attrs.shape), jnp.float32)
gid = bins.gid                      # packed order (tile,depth)
gid_sorted = jnp.sort(gid)


@jax.jit
def seg_sorted_flag(d, g):
    return jax.ops.segment_sum(d, g, num_segments=P + 1, indices_are_sorted=True)


@jax.jit
def sort_then_seg(d, g):
    gs, perm = jax.lax.sort((g, jnp.arange(g.shape[0], dtype=jnp.int32)),
                            num_keys=1, is_stable=False)
    return jax.ops.segment_sum(d[perm], gs, num_segments=P + 1,
                               indices_are_sorted=True)


timeit("segment_sum sorted ids+flag", seg_sorted_flag, dattrs, gid_sorted)
timeit("sort gid + gather + seg_sum", sort_then_seg, dattrs, gid)

# cumsum-difference segment sum over slot-ordered pairs
counts = proc.tiles_touched.astype(jnp.int32)
cum = jnp.cumsum(counts)
offsets = cum - counts


@jax.jit
def cumsum_seg(d_slot, offsets, counts):
    cs = jnp.cumsum(d_slot, axis=0)
    zero = jnp.zeros((1, d_slot.shape[1]), d_slot.dtype)
    cs = jnp.concatenate([zero, cs], axis=0)
    return cs[offsets + counts] - cs[offsets]


d_slot = dattrs[: PAIR_CAP]
timeit("cumsum-diff seg (4M,16)", cumsum_seg, d_slot, offsets, counts)

print("== scatter costs ==")
dest = jnp.abs(jax.random.randint(jax.random.PRNGKey(2), (4_000_000,), 0,
                                  bins.attrs.shape[0]))


@jax.jit
def scat_i32(dest):
    return jnp.zeros((bins.attrs.shape[0],), jnp.int32).at[dest].set(
        jnp.arange(4_000_000, dtype=jnp.int32), mode="drop")


timeit("i32 permutation scatter (4M)", scat_i32, dest)


@jax.jit
def tile_counts_scatter(tile):
    return jnp.zeros((num_tiles + 1,), jnp.int32).at[tile].add(1, mode="drop")


@jax.jit
def tile_counts_searchsorted(tile_sorted):
    edges = jnp.searchsorted(tile_sorted, jnp.arange(num_tiles + 2, dtype=jnp.int32))
    return jnp.diff(edges)


tile_r = jax.random.randint(jax.random.PRNGKey(3), (4_000_000,), 0, num_tiles + 1)
tile_s = jnp.sort(tile_r)
timeit("tile counts scatter-add (4M->1K)", tile_counts_scatter, tile_r)
timeit("tile counts searchsorted", tile_counts_searchsorted, tile_s)

print("== cov3d unroll ==")
from luciddreamer_tpu.core import covariance


def build_cov3d_unrolled(scale, quat, scale_modifier=1.0):
    r, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    sx = scale[..., 0] * scale_modifier
    sy = scale[..., 1] * scale_modifier
    sz = scale[..., 2] * scale_modifier
    # M = R diag(s); rows of R
    r00 = 1.0 - 2.0 * (y * y + z * z); r01 = 2.0 * (x * y - r * z); r02 = 2.0 * (x * z + r * y)
    r10 = 2.0 * (x * y + r * z); r11 = 1.0 - 2.0 * (x * x + z * z); r12 = 2.0 * (y * z - r * x)
    r20 = 2.0 * (x * z - r * y); r21 = 2.0 * (y * z + r * x); r22 = 1.0 - 2.0 * (x * x + y * y)
    m00, m01, m02 = r00 * sx, r01 * sy, r02 * sz
    m10, m11, m12 = r10 * sx, r11 * sy, r12 * sz
    m20, m21, m22 = r20 * sx, r21 * sy, r22 * sz
    c_xx = m00 * m00 + m01 * m01 + m02 * m02
    c_xy = m00 * m10 + m01 * m11 + m02 * m12
    c_xz = m00 * m20 + m01 * m21 + m02 * m22
    c_yy = m10 * m10 + m11 * m11 + m12 * m12
    c_yz = m10 * m20 + m11 * m21 + m12 * m22
    c_zz = m20 * m20 + m21 * m21 + m22 * m22
    return jnp.stack([c_xx, c_xy, c_xz, c_yy, c_yz, c_zz], axis=-1)


sc, qn = params.get_scaling(), params.get_rotation()
sc = jax.block_until_ready(sc); qn = jax.block_until_ready(qn)
c_old = timeit("build_cov3d matmul", jax.jit(covariance.build_cov3d), sc, qn)
c_new = timeit("build_cov3d unrolled", jax.jit(build_cov3d_unrolled), sc, qn)
print("   max abs diff:", float(jnp.max(jnp.abs(c_old - c_new))))

print("== pallas blend alone ==")
from luciddreamer_tpu.render.pallas_blend import _fwd_call, _bwd_call

fwd_k = jax.jit(lambda a, ct, ck: _fwd_call(a, ct, ck, grid_x, grid_y, TILE, CHUNK))
state = timeit("pallas fwd blend", fwd_k, bins.attrs, bins.chunk_tile, bins.chunk_k0)
bwd_k = jax.jit(lambda a, ct, ck, s, ds: _bwd_call(a, ct, ck, s, ds, grid_x, grid_y, TILE, CHUNK))
timeit("pallas bwd blend", bwd_k, bins.attrs, bins.chunk_tile, bins.chunk_k0,
       state, jnp.ones_like(state))
