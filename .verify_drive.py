"""Canonical verify drive: 20k-Gaussian 512x512 render through the public
API on the real TPU, PNG out, jitted grad step, 64x64 dense-oracle crop."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.render.tiled import render_tiled
from luciddreamer_tpu.render.dense import render_dense

P = 20_000
H = W = 512
rng = np.random.default_rng(7)
params = GaussianParams(
    xyz=jnp.asarray(rng.normal(size=(P, 3)) * 0.8 + [0, 0, 3.0], jnp.float32),
    features_dc=jnp.asarray(rng.normal(size=(P, 1, 3)) * 0.5, jnp.float32),
    features_rest=jnp.asarray(rng.normal(size=(P, 15, 3)) * 0.05, jnp.float32),
    scaling=jnp.asarray(rng.uniform(-4.5, -2.5, size=(P, 3)), jnp.float32),
    rotation=jnp.asarray(rng.normal(size=(P, 4)), jnp.float32),
    opacity=jnp.asarray(rng.uniform(-1.0, 2.0, size=(P, 1)), jnp.float32),
    alive=jnp.ones(P, bool),
)
cam = make_camera(np.eye(4), 0.8279, 0.8279, W, H)
bg = jnp.zeros(3)
print("backend:", jax.default_backend(), flush=True)

render = jax.jit(functools.partial(
    render_tiled, bg=bg, active_sh_degree=3, chunk=128, pair_cap=400_000,
    backend="pallas"))
t0 = time.time()
out = jax.block_until_ready(render(params, cam))
print(f"fwd compile+run {time.time()-t0:.1f}s overflow={bool(out['overflow'])} "
      f"pairs={int(out['num_pairs'])}", flush=True)
assert not bool(out["overflow"])
img = np.asarray(out["render"])
depth = np.asarray(out["depth"])
print("img range", img.min(), img.max(), "depth range", depth.min(),
      depth.max(), flush=True)
assert np.isfinite(img).all() and np.isfinite(depth).all()

from PIL import Image
Image.fromarray(
    (np.clip(img.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
).save("/tmp/verify_render.png")
print("wrote /tmp/verify_render.png", flush=True)


def loss(pdict):
    p = GaussianParams.from_param_pytree(pdict, params.alive)
    o = render_tiled(p, cam, bg, active_sh_degree=3, chunk=128,
                     pair_cap=400_000, backend="pallas")
    return jnp.mean(jnp.abs(o["render"] - 0.5)) + 0.1 * jnp.mean(o["depth"])


g = jax.block_until_ready(jax.jit(jax.grad(loss))(params.param_pytree()))
for k, v in g.items():
    assert bool(jnp.isfinite(v).all()), k
print("grads finite:", {k: float(jnp.abs(v).max()) for k, v in g.items()},
      flush=True)

# dense-oracle parity on a 128x128 camera (same scene, same intrinsics
# semantics; keeps the O(P * pixels) oracle cheap on the single chip)
cam_s = make_camera(np.eye(4), 0.8279, 0.8279, 128, 128)
ot = jax.block_until_ready(jax.jit(functools.partial(
    render_tiled, bg=bg, active_sh_degree=3, chunk=128, pair_cap=400_000,
    backend="pallas"))(params, cam_s))
od = jax.block_until_ready(jax.jit(functools.partial(
    render_dense, bg=bg, active_sh_degree=3))(params, cam_s))
err = np.abs(np.asarray(od["render"]) - np.asarray(ot["render"])).max()
errd = np.abs(np.asarray(od["depth"]) - np.asarray(ot["depth"])).max()
print("tiled-vs-dense 128x128: rgb", err, "depth", errd, flush=True)
assert err <= 1e-5 and errd <= 1e-4, (err, errd)
print("VERIFY OK", flush=True)
