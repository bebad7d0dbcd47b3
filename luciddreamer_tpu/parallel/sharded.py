"""Multi-chip rendering and training: tile-row sharding over a device mesh.

The reference has NO distributed support in its pipeline (device hardcoded
'cuda', luciddreamer.py:51-55; only the vendored ZoeDepth trainer uses
NCCL DDP, ZoeDepth/zoedepth/utils/misc.py:251-282).  This module is the
TPU-native scaling design (SURVEY.md §2.4/§7.9):

* mesh axes ``("data", "tiles")`` — cameras over ``data`` (classic DP),
  image tile-rows over ``tiles`` (the sequence-parallel analogue for a
  renderer: pixels are the long axis);
* Gaussians are REPLICATED (a few M x ~60 floats fits HBM comfortably);
  each chip preprocesses all Gaussians, restricts their tile rects to its
  row band, bins and blends only its rows — compute for binning/blend
  (the dominant cost) scales with 1/n_tiles;
* the loss (L1 + windowed SSIM) is computed OUTSIDE shard_map on the
  row-sharded image: GSPMD inserts the halo exchanges for the 11x11 SSIM
  window and the final scalar reduction;
* the parameter-gradient all-reduce over ICI is inserted by XLA in the
  backward of shard_map (replicated params used by all shards), where the
  compiler can overlap it with remaining backward work.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from luciddreamer_tpu.config import GSConfig
from luciddreamer_tpu.core.types import Camera, GaussianParams, ProcessedGaussians
from luciddreamer_tpu.render import blend_math
from luciddreamer_tpu.render.binning import build_tile_bins, num_tiles_for
from luciddreamer_tpu.render.preprocess import preprocess_gaussians
from luciddreamer_tpu.render.xla_blend import blend_tiles_xla, tilemajor_to_image
from luciddreamer_tpu.train.losses import l1_loss, ssim


def make_mesh(devices=None, data: int = 1, tiles: Optional[int] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    tiles = tiles or (len(devices) // data)
    assert data * tiles == len(devices), (data, tiles, len(devices))
    import numpy as np

    return Mesh(np.asarray(devices).reshape(data, tiles), ("data", "tiles"))


def _restrict_rows(proc: ProcessedGaussians, ty0, grid_y_local: int,
                   grid_x: int) -> ProcessedGaussians:
    """Clip every Gaussian's tile rect to tile rows [ty0, ty0+grid_y_local)
    (local coordinates); recompute tiles_touched.

    ``visible``/``radius`` are deliberately left band-INdependent: they
    follow the reference's 3-sigma rect (forward.cu:229-236) while the
    binning rect is opacity/anisotropy-tightened (render/preprocess.py), so
    a gaussian whose tight rect misses every band must still report its
    radius for densification bookkeeping — zeroing it per band would make
    the sharded radii disagree with the single-device render."""
    rmin = proc.rect_min
    rmax = proc.rect_max
    new_min_y = jnp.clip(rmin[:, 1] - ty0, 0, grid_y_local)
    new_max_y = jnp.clip(rmax[:, 1] - ty0, 0, grid_y_local)
    tiles = (rmax[:, 0] - rmin[:, 0]) * (new_max_y - new_min_y)
    tiles = jnp.where(proc.visible & (tiles > 0), tiles, 0)
    return proc.replace(
        rect_min=jnp.stack([rmin[:, 0], new_min_y], axis=-1),
        rect_max=jnp.stack([rmax[:, 0], new_max_y], axis=-1),
        tiles_touched=tiles,
    )


def _render_rows(params, camera, bg, ty0, grid_y_local, *, active_sh_degree,
                 tile_size, chunk, pair_cap, backend, mean2d_offset=None):
    """Render tile rows [ty0, ty0+grid_y_local); returns (render, depth, acc,
    overflow) with images of height grid_y_local*tile_size."""
    grid_x, _ = num_tiles_for(camera.height, camera.width, tile_size)
    h_local = grid_y_local * tile_size
    proc = preprocess_gaussians(
        params, camera, active_sh_degree, tile_size,
        mean2d_offset=mean2d_offset,
    )
    # global pixel coords are preserved by shifting mean2d into the band's
    # local frame (the conic/pixel math is translation-invariant)
    proc = _restrict_rows(proc, ty0, grid_y_local, grid_x)
    proc = proc.replace(
        mean2d=proc.mean2d - jnp.array([0.0, 1.0]) * (ty0 * tile_size)
    )
    bins = build_tile_bins(
        proc, h_local, camera.width, tile_size, pair_cap, chunk
    )
    if backend == "pallas":
        from luciddreamer_tpu.render.pallas_blend import blend_tiles_pallas

        interpret = jax.default_backend() != "tpu"
        carry = blend_tiles_pallas(bins, grid_x, grid_y_local, tile_size,
                                   chunk, interpret=interpret)
    else:
        carry = blend_tiles_xla(bins, grid_x, grid_y_local, tile_size, chunk)

    npix = tile_size * tile_size
    n_state = grid_x * grid_y_local + 1
    unflat = lambda x: x.reshape(x.shape[:-1] + (n_state, npix))
    carry = blend_math.BlendCarry(*(unflat(f) for f in carry))
    rgb, depth = blend_math.finalize(carry, bg[:, None])
    to_img = functools.partial(
        tilemajor_to_image, grid_x=grid_x, grid_y=grid_y_local,
        tile_size=tile_size, height=h_local, width=camera.width,
    )
    return {
        "render": to_img(rgb),
        "depth": to_img(depth),
        "acc": to_img(carry.acc),
        "radii": proc.radius,
        "overflow": bins.overflow,
    }


def render_sharded(
    params: GaussianParams,
    camera: Camera,
    bg: jax.Array,
    mesh: Mesh,
    active_sh_degree: int = 3,
    tile_size: int = 16,
    chunk: int = 64,
    pair_cap: int | None = None,
    backend: str = "xla",
    mean2d_offset: jax.Array | None = None,
):
    """Single-camera render with tile rows sharded over the 'tiles' axis.

    Returns the full (row-sharded) image dict; params replicated.
    """
    n_tiles_axis = mesh.shape["tiles"]
    grid_x, grid_y = num_tiles_for(camera.height, camera.width, tile_size)
    assert grid_y % n_tiles_axis == 0, (grid_y, n_tiles_axis)
    grid_y_local = grid_y // n_tiles_axis
    if pair_cap is None:
        pair_cap = max(4096, int(params.capacity * 8) // n_tiles_axis)

    def body(params, camera, bg, offset):
        d = jax.lax.axis_index("tiles")
        out = _render_rows(
            params, camera, bg, d * grid_y_local, grid_y_local,
            active_sh_degree=active_sh_degree, tile_size=tile_size,
            chunk=chunk, pair_cap=pair_cap, backend=backend,
            mean2d_offset=offset,
        )
        return (
            out["render"],
            out["depth"],
            out["acc"],
            out["radii"][None],       # (1, P): per-shard radii
            out["overflow"][None],
        )

    offset = (
        mean2d_offset
        if mean2d_offset is not None
        else jnp.zeros_like(params.xyz[:, :2])
    )
    render, depth, acc, radii, overflow = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(
            P(None, "tiles", None),    # (3, H, W) rows sharded
            P("tiles", None),          # (H, W)
            P("tiles", None),
            P("tiles", None),          # (n, P) per-shard radii
            P("tiles"),
        ),
        check_vma=False,
    )(params, camera, bg, offset)
    return {
        "render": render,
        "depth": depth,
        "acc": acc,
        "radii": jnp.max(radii, axis=0),
        "overflow": jnp.any(overflow),
    }


def sharded_loss_fn(pdict, alive, camera, gt_image, bg, mesh, cfg: GSConfig,
                    mean2d_offset=None, **render_kw):
    """L1 + D-SSIM on a tile-sharded render; differentiable w.r.t. pdict and
    mean2d_offset.  GSPMD handles the SSIM window halos on the sharded image
    and the grad all-reduce in backward."""
    params = GaussianParams.from_param_pytree(pdict, alive)
    out = render_sharded(params, camera, bg, mesh,
                         mean2d_offset=mean2d_offset, **render_kw)
    img = out["render"]
    ll1 = l1_loss(img, gt_image)
    loss = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (
        1.0 - ssim(img, gt_image)
    )
    return loss, out


def render_sharded_batch(
    params: GaussianParams,
    cam_batch: Camera,                 # leaf arrays have leading dim B == mesh data axis
    bg: jax.Array,
    mesh: Mesh,
    active_sh_degree: int = 3,
    tile_size: int = 16,
    chunk: int = 64,
    pair_cap: int | None = None,
    backend: str = "xla",
    mean2d_offset: jax.Array | None = None,
):
    """Data-parallel x tile-parallel render: camera b of the batch is rendered
    by mesh column b's chips, each chip blending its tile-row band.  Returns
    (B, 3, H, W) images sharded P('data', None, 'tiles', None), plus
    per-shard radii max and overflow."""
    n_data = mesh.shape["data"]
    n_tiles_axis = mesh.shape["tiles"]
    H = cam_batch.height
    W = cam_batch.width
    grid_x, grid_y = num_tiles_for(H, W, tile_size)
    assert grid_y % n_tiles_axis == 0
    grid_y_local = grid_y // n_tiles_axis
    if pair_cap is None:
        pair_cap = max(4096, int(params.capacity * 8) // n_tiles_axis)

    def body(params, cams, bg, offset):
        d = jax.lax.axis_index("tiles")
        cam = jax.tree.map(lambda x: x[0], cams)       # local batch of 1
        out = _render_rows(
            params, cam, bg, d * grid_y_local, grid_y_local,
            active_sh_degree=active_sh_degree, tile_size=tile_size,
            chunk=chunk, pair_cap=pair_cap, backend=backend,
            mean2d_offset=offset,
        )
        return (
            out["render"][None],
            out["depth"][None],
            out["radii"][None, None],
            out["overflow"][None, None],
        )

    offset = (
        mean2d_offset
        if mean2d_offset is not None
        else jnp.zeros_like(params.xyz[:, :2])
    )
    render, depth, radii, overflow = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("data"), P(), P()),
        out_specs=(
            P("data", None, "tiles", None),
            P("data", "tiles", None),
            P("data", "tiles", None),
            P("data", "tiles"),
        ),
        check_vma=False,
    )(params, cam_batch, bg, offset)
    return {
        "render": render,
        "depth": depth,
        "radii": jnp.max(radii, axis=(0, 1)),
        "overflow": jnp.any(overflow),
    }


def sharded_train_step_batch(state, cam_batch, gt_batch, bg, mesh,
                             cfg: GSConfig, extent: float,
                             gt_depth_batch=None, **render_kw):
    """Full dp x tiles training step over a camera batch of size
    mesh.shape['data'].  Gradients from every (camera, tile-band) shard are
    all-reduced by XLA in shard_map's backward; the update itself runs
    replicated.  Jit under the mesh.

    Exactly like the single-device ``Trainer._step``, an update computed
    from a truncated pair list is NEVER committed: on overflow the whole
    state update (params, adam, stats, step) is voided device-side and the
    host re-runs the iteration after growing pair_cap (train/loop.py:151-169
    discipline; the reference never drops pairs, rasterize_points.cu:27-33).
    """
    from luciddreamer_tpu.model.gaussians import add_densification_stats
    from luciddreamer_tpu.model.optim import adam_update, learning_rates
    from luciddreamer_tpu.train.loop import TrainState, sh_band_mask

    it = state.step + 1
    params = state.params
    max_deg = params.max_sh_degree
    mask = sh_band_mask(jnp.minimum(it // 1000, max_deg),
                        (max_deg + 1) ** 2 - 1)

    def loss_fn(pdict, offset):
        pdict = dict(pdict, f_rest=pdict["f_rest"] * mask[None])
        p = GaussianParams.from_param_pytree(pdict, params.alive)
        out = render_sharded_batch(p, cam_batch, bg, mesh,
                                   mean2d_offset=offset,
                                   active_sh_degree=max_deg, **render_kw)
        img = out["render"]                       # (B, 3, H, W)
        ll1 = l1_loss(img, gt_batch)
        dssim = 1.0 - jnp.mean(jax.vmap(ssim)(img, gt_batch))
        loss = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * dssim
        if cfg.lambda_depth > 0.0 and gt_depth_batch is not None:
            dmask = (gt_depth_batch > 0) & (out["depth"] > 0)
            dl = jnp.sum(jnp.abs(out["depth"] - gt_depth_batch) * dmask) / (
                jnp.sum(dmask) + 1e-8
            )
            loss = loss + cfg.lambda_depth * dl
        return loss, out

    pdict = params.param_pytree()
    offset = jnp.zeros_like(params.xyz[:, :2])
    (loss, out), (grads, g2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(pdict, offset)

    lrs = learning_rates(cfg, extent, it - 1)
    new_pdict, adam = adam_update(pdict, grads, state.adam, lrs)
    stats = add_densification_stats(state.stats, g2d, out["radii"])

    ovf = out["overflow"]
    gate = lambda new, old: jax.tree.map(
        lambda a, b: jnp.where(ovf, b, a), new, old
    )
    return (
        TrainState(
            params=GaussianParams.from_param_pytree(
                gate(new_pdict, pdict), params.alive
            ),
            adam=gate(adam, state.adam),
            stats=gate(stats, state.stats),
            step=jnp.where(ovf, state.step, it),
        ),
        loss,
        ovf,
    )


def sharded_train_step(state, camera, gt_image, bg, mesh, cfg: GSConfig,
                       extent: float, **render_kw):
    """One full 3DGS training step (render -> loss -> grads -> Adam ->
    densify stats) with the render sharded over the mesh's 'tiles' axis.
    ``state`` is a train.loop.TrainState.  Jit this under the mesh."""
    from luciddreamer_tpu.model.gaussians import add_densification_stats
    from luciddreamer_tpu.model.optim import adam_update, learning_rates
    from luciddreamer_tpu.train.loop import TrainState, sh_band_mask

    it = state.step + 1
    params = state.params
    max_deg = params.max_sh_degree
    mask = sh_band_mask(jnp.minimum(it // 1000, max_deg),
                        (max_deg + 1) ** 2 - 1)

    def loss_fn(pdict, offset):
        pdict = dict(pdict, f_rest=pdict["f_rest"] * mask[None])
        return sharded_loss_fn(
            pdict, params.alive, camera, gt_image, bg, mesh, cfg,
            mean2d_offset=offset, active_sh_degree=max_deg, **render_kw,
        )

    pdict = params.param_pytree()
    offset = jnp.zeros_like(params.xyz[:, :2])
    (loss, out), (grads, g2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(pdict, offset)

    lrs = learning_rates(cfg, extent, it - 1)
    new_pdict, adam = adam_update(pdict, grads, state.adam, lrs)
    stats = add_densification_stats(state.stats, g2d, out["radii"])
    return (
        TrainState(
            params=GaussianParams.from_param_pytree(new_pdict, params.alive),
            adam=adam,
            stats=stats,
            step=it,
        ),
        loss,
        out["overflow"],
    )
