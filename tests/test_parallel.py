"""Tile-sharded rendering/training on the virtual 8-device CPU mesh.

The sharded render must match the single-device tiled render exactly, and
the full dp x tiles train step must compile, run, and produce gradients
matching the unsharded step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luciddreamer_tpu.config import GSConfig
from luciddreamer_tpu.core.transforms import make_camera
from luciddreamer_tpu.model.optim import adam_init
from luciddreamer_tpu.model.gaussians import DensifyStats
from luciddreamer_tpu.parallel import (
    make_mesh,
    render_sharded,
    sharded_train_step_batch,
)
from luciddreamer_tpu.render.tiled import render_tiled
from luciddreamer_tpu.train.loop import TrainState, Trainer
from tests.helpers import make_random_gaussians

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _cam(W=64, H=128, dx=0.0):
    c2w = np.eye(4)
    c2w[0, 3] = dx
    return make_camera(c2w, 0.8279, 0.8279, W, H)


def test_sharded_render_matches_unsharded(rng):
    params = make_random_gaussians(120, rng, scale_range=(-3.5, -1.0))
    cam = _cam()                      # 128 rows -> 8 tile rows, 1 per device
    bg = jnp.array([0.1, 0.2, 0.3])
    mesh = make_mesh(data=1, tiles=8)

    ref = render_tiled(params, cam, bg, active_sh_degree=3, chunk=64)
    with mesh:
        out = jax.jit(
            lambda p: render_sharded(p, cam, bg, mesh, chunk=64)
        )(params)
    assert not bool(out["overflow"])
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["radii"]),
                                  np.asarray(ref["radii"]))


def test_sharded_grads_match_unsharded(rng):
    params = make_random_gaussians(80, rng, scale_range=(-3.0, -1.0))
    cam = _cam()
    bg = jnp.zeros(3)
    mesh = make_mesh(data=1, tiles=8)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 128, 64))

    def loss_ref(pdict):
        from luciddreamer_tpu.core.types import GaussianParams

        p = GaussianParams.from_param_pytree(pdict, params.alive)
        return jnp.sum(render_tiled(p, cam, bg, chunk=64)["render"] * w)

    def loss_sh(pdict):
        from luciddreamer_tpu.core.types import GaussianParams

        p = GaussianParams.from_param_pytree(pdict, params.alive)
        return jnp.sum(render_sharded(p, cam, bg, mesh, chunk=64)["render"] * w)

    pdict = params.param_pytree()
    g_ref = jax.grad(loss_ref)(pdict)
    with mesh:
        g_sh = jax.jit(jax.grad(loss_sh))(pdict)
    for name in pdict:
        gr = np.asarray(g_ref[name])
        gs = np.asarray(g_sh[name])
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gs / scale, gr / scale, atol=3e-4,
                                   err_msg=name)


def test_sharded_trainer_matches_single_device(rng):
    """data=1 x tiles=8 ShardedTrainer must track the single-device Trainer
    step for step on the same seed (same camera sequence, same densify keys);
    only shard reduction order may differ."""
    import jax.numpy as jnp
    from luciddreamer_tpu.model.gaussians import create_from_pcd
    from luciddreamer_tpu.parallel import ShardedTrainer

    pts = rng.normal(size=(48, 3)) * 0.5 + [0, 0, 3.0]
    cols = rng.uniform(0.1, 0.9, size=(48, 3))
    params = create_from_pcd(jnp.asarray(pts), jnp.asarray(cols), capacity=128)
    cams = [_cam(64, 128, dx) for dx in (-0.2, 0.0, 0.2)]
    bg = jnp.zeros(3)
    target = make_random_gaussians(60, rng, scale_range=(-3.0, -1.5))
    views = [
        (c, render_tiled(target, c, bg, active_sh_degree=3)["render"])
        for c in cams
    ]

    cfg = GSConfig(
        iterations=40, densification_interval=10, densify_from_iter=10,
        position_lr_max_steps=40, densify_grad_threshold=1e-5,
    )
    mesh = make_mesh(data=1, tiles=8)
    # both step functions donate their state, so each trainer needs its own
    # copy of the parameter buffers
    p1 = jax.tree.map(jnp.copy, params)
    p2 = jax.tree.map(jnp.copy, params)
    tr_ref = Trainer(p1, cfg, cameras_extent=1.0, seed=0,
                     pair_cap=4096, backend="xla", chunk=64)
    tr_sh = ShardedTrainer(p2, cfg, cameras_extent=1.0, mesh=mesh,
                           seed=0, pair_cap=4096, backend="xla", chunk=64)
    st_ref = tr_ref.run(views)
    st_sh = tr_sh.run(views)

    assert int(st_sh.step) == int(st_ref.step) == 40
    # no pair-cap growth fired (which would desynchronize the two rng
    # streams); densify-capacity overflow is fine — it hits both trainers
    # identically on the same key sequence
    assert tr_sh.pair_cap == tr_ref.pair_cap == 4096
    np.testing.assert_array_equal(np.asarray(st_sh.params.alive),
                                  np.asarray(st_ref.params.alive))
    a_ref = np.asarray(st_ref.params.xyz)
    a_sh = np.asarray(st_sh.params.xyz)
    np.testing.assert_allclose(a_sh, a_ref, atol=2e-4)


def test_sharded_trainer_long_run_densifies_and_converges(rng):
    """2x4 mesh, 200 iterations: densification fires, loss drops, overflow
    growth protocol exercised via a deliberately tight initial pair_cap."""
    import jax.numpy as jnp
    from luciddreamer_tpu.model.gaussians import create_from_pcd
    from luciddreamer_tpu.parallel import ShardedTrainer

    pts = rng.normal(size=(48, 3)) * 0.5 + [0, 0, 3.0]
    cols = rng.uniform(0.1, 0.9, size=(48, 3))
    params = create_from_pcd(jnp.asarray(pts), jnp.asarray(cols), capacity=256)
    cams = [_cam(64, 64, dx) for dx in (-0.2, 0.0, 0.2)]
    bg = jnp.zeros(3)
    target = make_random_gaussians(60, rng, scale_range=(-3.0, -1.5))
    views = [
        (c, render_tiled(target, c, bg, active_sh_degree=3)["render"])
        for c in cams
    ]

    cfg = GSConfig(
        iterations=200, densification_interval=50, densify_from_iter=50,
        position_lr_max_steps=200, densify_grad_threshold=1e-5,
    )
    mesh = make_mesh(data=2, tiles=4)
    tr = ShardedTrainer(params, cfg, cameras_extent=1.0, mesh=mesh, seed=0,
                        pair_cap=64, backend="xla", chunk=32)
    losses = []
    st = tr.run(views, callback=lambda it, s, l: losses.append(l))
    losses = np.asarray([float(l) for l in losses])

    assert int(st.step) == 200
    assert np.isfinite(losses).all()
    assert np.mean(losses[-20:]) < 0.7 * np.mean(losses[:10]), (
        np.mean(losses[:10]), np.mean(losses[-20:])
    )
    # densification changed the population
    assert int(st.params.num_alive) != 48
    # the tight initial cap must have grown through the overflow protocol
    assert tr.pair_cap > 64 and tr.last_overflow


def test_ring_all_reduce_matches_psum(rng):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from luciddreamer_tpu.parallel.overlap import ring_all_reduce

    mesh = make_mesh(data=2, tiles=4)
    x = jnp.asarray(rng.normal(size=(8, 37)), jnp.float32)  # 37: forces pad

    def body(x):
        ring_t = ring_all_reduce(x[0], "tiles", 4)
        ring_d = ring_all_reduce(ring_t, "data", 2)
        ref = jax.lax.psum(x[0], ("data", "tiles"))
        return (ring_d - ref)[None], ring_d[None]

    with mesh:
        diff, val = jax.jit(shard_map(
            body, mesh=mesh, in_specs=(P(("data", "tiles")),),
            out_specs=(P(("data", "tiles")), P(("data", "tiles"))),
            check_vma=False,
        ))(x)
    assert float(jnp.abs(diff).max()) < 1e-5
    np.testing.assert_allclose(np.asarray(val)[0],
                               np.asarray(x).sum(0), rtol=1e-6)


def test_overlapped_step_matches_autodiff_step(rng):
    """The manual chunked-ring + interleaved-Adam step must reproduce the
    autodiff sharded step: same loss, same updated parameters."""
    from luciddreamer_tpu.parallel.overlap import sharded_train_step_overlapped

    params = make_random_gaussians(60, rng, scale_range=(-3.0, -1.5))
    W, H = 64, 64
    cams = [_cam(W, H, dx) for dx in (-0.2, 0.2)]
    bg = jnp.zeros(3)
    gt = jnp.stack([
        render_tiled(params, c, bg, active_sh_degree=3)["render"]
        for c in cams
    ])
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    mesh = make_mesh(data=2, tiles=4)
    cfg = GSConfig()

    def mk_state(p):
        return TrainState(
            params=p, adam=adam_init(p.param_pytree()),
            stats=DensifyStats.zero(p.capacity),
            step=jnp.zeros((), jnp.int32),
        )

    p1 = jax.tree.map(jnp.copy, params)
    p2 = jax.tree.map(jnp.copy, params)
    with mesh:
        s_ref, loss_ref, ovf_ref = jax.jit(
            lambda s: sharded_train_step_batch(
                s, cam_batch, gt, bg, mesh, cfg, extent=1.0, chunk=32
            )
        )(mk_state(p1))
        s_ovl, loss_ovl, ovf_ovl = jax.jit(
            lambda s: sharded_train_step_overlapped(
                s, cam_batch, gt, bg, mesh, cfg, extent=1.0, chunk=32
            )
        )(mk_state(p2))

    assert not bool(ovf_ref) and not bool(ovf_ovl)
    assert float(loss_ovl) == pytest.approx(float(loss_ref), rel=1e-5)
    for k in s_ref.params.param_pytree():
        a = np.asarray(s_ref.params.param_pytree()[k])
        b = np.asarray(s_ovl.params.param_pytree()[k])
        np.testing.assert_allclose(b, a, atol=2e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(s_ovl.stats.grad_accum),
                               np.asarray(s_ref.stats.grad_accum),
                               atol=1e-6)
    assert int(s_ovl.step) == int(s_ref.step) == 1


def test_overlapped_step_matches_autodiff_step_with_depth(rng):
    """Overlapped vs batch step equality with the masked depth-L1 term
    active (lambda_depth > 0, depth-bearing views) — the north-star
    config-5 step must train with the same loss configs 3 uses."""
    from luciddreamer_tpu.parallel.overlap import sharded_train_step_overlapped

    params = make_random_gaussians(60, rng, scale_range=(-3.0, -1.5))
    W, H = 64, 64
    cams = [_cam(W, H, dx) for dx in (-0.2, 0.2)]
    bg = jnp.zeros(3)
    rendered = [
        render_tiled(params, c, bg, active_sh_degree=3) for c in cams
    ]
    gt = jnp.stack([r["render"] for r in rendered])
    # perturbed gt depth so the depth term has signal; zeros in a corner
    # exercise the gt>0 half of the mask
    gt_depth = jnp.stack([r["depth"] * 1.1 for r in rendered])
    gt_depth = gt_depth.at[:, :8, :8].set(0.0)
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    mesh = make_mesh(data=2, tiles=4)
    cfg = GSConfig(lambda_depth=0.3)

    def mk_state(p):
        return TrainState(
            params=p, adam=adam_init(p.param_pytree()),
            stats=DensifyStats.zero(p.capacity),
            step=jnp.zeros((), jnp.int32),
        )

    p1 = jax.tree.map(jnp.copy, params)
    p2 = jax.tree.map(jnp.copy, params)
    with mesh:
        s_ref, loss_ref, ovf_ref = jax.jit(
            lambda s: sharded_train_step_batch(
                s, cam_batch, gt, bg, mesh, cfg, extent=1.0, chunk=32,
                gt_depth_batch=gt_depth,
            )
        )(mk_state(p1))
        s_ovl, loss_ovl, ovf_ovl = jax.jit(
            lambda s: sharded_train_step_overlapped(
                s, cam_batch, gt, bg, mesh, cfg, extent=1.0, chunk=32,
                gt_depth_batch=gt_depth,
            )
        )(mk_state(p2))

    assert not bool(ovf_ref) and not bool(ovf_ovl)
    # sanity: the depth term actually contributes (loss without it differs)
    _, loss_nod, _ = jax.jit(
        lambda s: sharded_train_step_batch(
            s, cam_batch, gt, bg, mesh, cfg, extent=1.0, chunk=32,
        )
    )(mk_state(jax.tree.map(jnp.copy, params)))
    assert abs(float(loss_ref) - float(loss_nod)) > 1e-4
    assert float(loss_ovl) == pytest.approx(float(loss_ref), rel=1e-5)
    for k in s_ref.params.param_pytree():
        a = np.asarray(s_ref.params.param_pytree()[k])
        b = np.asarray(s_ovl.params.param_pytree()[k])
        np.testing.assert_allclose(b, a, atol=2e-5, err_msg=k)


def test_dp_tiles_train_step(rng):
    """2 data x 4 tiles mesh: one full training step, grads vs single-dev."""
    params = make_random_gaussians(60, rng, scale_range=(-3.0, -1.5))
    W, H = 64, 64                      # 4 tile rows over 4-way tiles axis
    cams = [_cam(W, H, dx) for dx in (-0.2, 0.2)]
    bg = jnp.zeros(3)
    gt = jnp.stack([
        render_tiled(params, c, bg, active_sh_degree=3)["render"]
        for c in cams
    ])
    # batch the cameras into one pytree with leading dim 2
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    mesh = make_mesh(data=2, tiles=4)
    cfg = GSConfig()
    state = TrainState(
        params=params,
        adam=adam_init(params.param_pytree()),
        stats=DensifyStats.zero(params.capacity),
        step=jnp.zeros((), jnp.int32),
    )
    with mesh:
        step = jax.jit(
            lambda s: sharded_train_step_batch(
                s, cam_batch, gt, bg, mesh, cfg, extent=1.0, chunk=32
            )
        )
        new_state, loss, ovf = step(state)
    assert np.isfinite(float(loss))
    assert not bool(ovf)
    assert int(new_state.step) == 1
    # params actually moved
    delta = np.abs(
        np.asarray(new_state.params.xyz) - np.asarray(params.xyz)
    ).max()
    assert delta > 0
    # gt == render(params) for both cameras -> loss tiny at the optimum...
    # but adam still steps; just check the stats accumulated visibility
    assert float(jnp.sum(new_state.stats.denom)) > 0
