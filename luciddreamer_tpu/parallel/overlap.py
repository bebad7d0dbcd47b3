"""Manual gradient-reduction overlap: chunked ring all-reduce + interleaved
Adam (SURVEY §7.9, north-star config 5).

AOT compilation of the autodiff-generated sharded step against a v5e:2x2
topology (tools/grad_overlap.py) shows XLA emits the parameter-gradient
psum as ONE monolithic synchronous all-reduce at the very end of the
backward — nothing overlaps it, and the latency-hiding scheduler leaves it
alone because its consumer (the whole Adam update) needs every operand.

This module restructures the step so overlap exists BY DATA DEPENDENCE,
not by scheduler luck:

* the loss is computed per shard (band L1 + band SSIM rows via a 5-row
  ppermute halo exchange — zero rows arrive at the global borders, matching
  the zero-padded 11x11 window of the global SSIM exactly), so ``jax.grad``
  inside the shard_map body yields *partial* per-shard gradients with NO
  automatic psum;
* the partials are then reduced with an explicit ring all-reduce
  (reduce-scatter + all-gather over ``ppermute`` steps, run over the
  'tiles' axis then the 'data' axis), one parameter chunk at a time, and
  each chunk's Adam update is issued as soon as that chunk's reduction
  lands — chunk i's ring steps are data-independent of chunk i-1's Adam
  math, so the compiler can (and, per the async collective-permute
  start/done pairs in the compiled HLO, does) run them concurrently;
* ``features_rest`` (45 of the 59 floats per Gaussian) is split into
  row-chunks so the pipeline has useful granularity.

Numerics are identical to ``sharded_train_step_batch`` (same loss, same
reduction values, same Adam); tests assert equality on the virtual mesh.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from luciddreamer_tpu.config import GSConfig
from luciddreamer_tpu.core.types import GaussianParams
from luciddreamer_tpu.model.gaussians import add_densification_stats
from luciddreamer_tpu.model.optim import BETA1, BETA2, EPS, AdamState, learning_rates
from luciddreamer_tpu.render.binning import num_tiles_for
from luciddreamer_tpu.parallel.sharded import _render_rows
from luciddreamer_tpu.train.loop import TrainState, sh_band_mask
from luciddreamer_tpu.train.losses import _blur, _gaussian_window


def ring_all_reduce(x, axis_name: str, n: int):
    """Sum ``x`` across ``axis_name`` (static size ``n``) with a ring:
    reduce-scatter then all-gather, 2(n-1) ppermute steps, bitwise
    deterministic accumulation order on every device."""
    if n == 1:
        return x
    idx = jax.lax.axis_index(axis_name)
    shape = x.shape
    flat = x.reshape(-1)
    pad = (-flat.size) % n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    parts = flat.reshape(n, -1)
    ring = [(i, (i + 1) % n) for i in range(n)]

    # reduce-scatter: after n-1 steps this device holds the full sum of
    # part (idx + 1) % n
    buf = jnp.take(parts, idx % n, axis=0)
    for s in range(n - 1):
        recv = jax.lax.ppermute(buf, axis_name, ring)
        buf = recv + jnp.take(parts, (idx - s - 1) % n, axis=0)
    owned = (idx + 1) % n

    # all-gather: circulate the owned blocks
    out = jnp.zeros_like(parts)
    out = jax.lax.dynamic_update_index_in_dim(out, buf, owned, 0)
    cur = buf
    for s in range(n - 1):
        cur = jax.lax.ppermute(cur, axis_name, ring)
        out = jax.lax.dynamic_update_index_in_dim(
            out, cur, (idx - s) % n, 0
        )
    flat_sum = out.reshape(-1)
    if pad:
        flat_sum = flat_sum[: flat.size - pad]
    return flat_sum.reshape(shape)


def _ring_all_reduce_2d(x, n_tiles: int, n_data: int):
    """Sum across the whole ('data', 'tiles') mesh: ring over 'tiles'
    (ICI-nearest axis) then over 'data'."""
    x = ring_all_reduce(x, "tiles", n_tiles)
    return ring_all_reduce(x, "data", n_data)


def _band_ssim_sum(img, gt, top_i, bot_i, top_g, bot_g,
                   window_size=11, sigma=1.5):
    """Sum over this band's rows of the GLOBAL zero-padded SSIM map.

    The extended band (halo + band + halo) reproduces the global blur
    exactly for the center rows: an 11x11 window reaches 5 rows out, and
    ppermute delivers zeros at the global borders — the same values the
    global conv's zero padding would read."""
    halo = window_size // 2
    ext_i = jnp.concatenate([top_i, img, bot_i], axis=1)
    ext_g = jnp.concatenate([top_g, gt, bot_g], axis=1)
    window = _gaussian_window(window_size, sigma)
    mu1 = _blur(ext_i, window)
    mu2 = _blur(ext_g, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _blur(ext_i * ext_i, window) - mu1_sq
    s2 = _blur(ext_g * ext_g, window) - mu2_sq
    s12 = _blur(ext_i * ext_g, window) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    h = img.shape[1]
    return jnp.sum(ssim_map[:, halo : halo + h, :])


def _halo(x, halo: int, n_tiles: int):
    """Exchange ``halo`` edge rows with the tile-axis neighbors; zero rows
    arrive at the global top/bottom (devices that are not a ppermute
    destination receive zeros)."""
    if n_tiles == 1:
        z = jnp.zeros_like(x[:, :halo, :])
        return z, z
    down = [(i, i + 1) for i in range(n_tiles - 1)]
    up = [(i + 1, i) for i in range(n_tiles - 1)]
    top = jax.lax.ppermute(x[:, -halo:, :], "tiles", down)
    bot = jax.lax.ppermute(x[:, :halo, :], "tiles", up)
    return top, bot


def sharded_train_step_overlapped(
    state: TrainState, cam_batch, gt_batch, bg, mesh: Mesh, cfg: GSConfig,
    extent: float, tile_size: int = 16, chunk: int = 64,
    pair_cap: int | None = None, backend: str = "xla",
    f_rest_chunks: int = 3, gt_depth_batch=None,
):
    """Drop-in twin of ``sharded_train_step_batch`` with manual chunked
    grad reduction overlapped with the optimizer (module docstring).

    ``gt_depth_batch`` (B, H, W): when given with cfg.lambda_depth > 0, the
    masked-L1 depth term of the batch step (parallel/sharded.py:299-304) is
    reproduced per shard — each band contributes its masked-|err| sum over
    the GLOBAL mask count, which needs one early scalar psum of the count
    (the mask carries no gradient, so the partial-gradient property of the
    per-shard loss is preserved and no parameter all-reduce sneaks in).
    This is the latent ``use_depth`` capability of the reference
    (arguments.py:17) in the north-star config-5 step.
    """
    n_data = mesh.shape["data"]
    n_tiles = mesh.shape["tiles"]
    params = state.params
    H = cam_batch.height
    W = cam_batch.width
    grid_x, grid_y = num_tiles_for(H, W, tile_size)
    assert grid_y % n_tiles == 0
    grid_y_local = grid_y // n_tiles
    h_local = grid_y_local * tile_size
    if pair_cap is None:
        pair_cap = max(4096, int(params.capacity * 8) // n_tiles)

    it = state.step + 1
    max_deg = params.max_sh_degree
    mask = sh_band_mask(jnp.minimum(it // 1000, max_deg),
                        (max_deg + 1) ** 2 - 1)
    lrs = learning_rates(cfg, extent, it - 1)
    lam = cfg.lambda_dssim
    denom = n_data * 3 * H * W
    use_depth = cfg.lambda_depth > 0.0 and gt_depth_batch is not None
    if not use_depth:
        # dummy keeps the shard_map signature fixed; never read
        gt_depth_batch = jnp.zeros((n_data, n_tiles, 1), jnp.float32)

    def body(pdict, alive, cams, gt, gtd, bg, mask, lr_vals, mu, nu, count,
             stats_leaves):
        t_idx = jax.lax.axis_index("tiles")
        cam = jax.tree.map(lambda x: x[0], cams)
        gt_band = gt[0]                             # (3, h_local, W)
        gtd_band = gtd[0]                           # (h_local, W) if used

        def local_loss(pd, offset):
            pd = dict(pd, f_rest=pd["f_rest"] * mask[None])
            p = GaussianParams.from_param_pytree(pd, alive)
            out = _render_rows(
                p, cam, bg, t_idx * grid_y_local, grid_y_local,
                active_sh_degree=max_deg, tile_size=tile_size, chunk=chunk,
                pair_cap=pair_cap, backend=backend, mean2d_offset=offset,
            )
            img = out["render"]
            l1_sum = jnp.sum(jnp.abs(img - gt_band))
            top_i, bot_i = _halo(img, 5, n_tiles)
            top_g, bot_g = _halo(gt_band, 5, n_tiles)
            ssim_sum = _band_ssim_sum(img, gt_band, top_i, bot_i,
                                      top_g, bot_g)
            contrib = ((1.0 - lam) * l1_sum - lam * ssim_sum) / denom
            if use_depth:
                dpt = out["depth"]
                dmask = ((gtd_band > 0) & (dpt > 0)).astype(img.dtype)
                num_s = jnp.sum(jnp.abs(dpt - gtd_band) * dmask)
                # global mask count: the mask has no gradient, so this psum
                # stays out of the parameter-gradient graph
                den_g = jax.lax.psum(
                    jax.lax.stop_gradient(jnp.sum(dmask)),
                    ("data", "tiles"),
                )
                contrib = contrib + cfg.lambda_depth * num_s / (den_g + 1e-8)
            return contrib, (out["radii"], out["overflow"])

        (contrib, (radii, ovf)), (grads, g2d) = jax.value_and_grad(
            local_loss, argnums=(0, 1), has_aux=True
        )(pdict, jnp.zeros_like(pdict["xyz"][:, :2]))

        # the constant lam from (1 - ssim_mean) carries no gradient; add it
        # back to the reported value after the scalar reduction
        loss = jax.lax.psum(contrib, ("data", "tiles")) + lam
        ovf_g = jax.lax.psum(ovf.astype(jnp.int32), ("data", "tiles")) > 0
        radii_max = jax.lax.pmax(radii, ("data", "tiles"))

        # ---- chunked ring reduction, Adam issued per chunk as it lands.
        # Work list: (name, slice) — features_rest split for pipelining.
        work = []
        for name in ("f_dc", "scaling", "rotation", "opacity", "xyz"):
            work.append((name, None))
        n_rest = pdict["f_rest"].shape[1]
        splits = np.linspace(0, n_rest, f_rest_chunks + 1).astype(int)
        for a, b in zip(splits[:-1], splits[1:]):
            if b > a:
                work.append(("f_rest", (int(a), int(b))))

        new_count = count + 1
        t = new_count.astype(jnp.float32)
        c1 = 1.0 - BETA1 ** t
        c2 = 1.0 - BETA2 ** t
        new_p = dict(pdict)
        new_mu = dict(mu)
        new_nu = dict(nu)
        for name, sl in work:
            g = grads[name] if sl is None else grads[name][:, sl[0]:sl[1]]
            g = _ring_all_reduce_2d(g, n_tiles, n_data)
            p0 = pdict[name] if sl is None else pdict[name][:, sl[0]:sl[1]]
            m0 = mu[name] if sl is None else mu[name][:, sl[0]:sl[1]]
            v0 = nu[name] if sl is None else nu[name][:, sl[0]:sl[1]]
            m1 = BETA1 * m0 + (1.0 - BETA1) * g
            v1 = BETA2 * v0 + (1.0 - BETA2) * (g * g)
            p1 = p0 - lr_vals[name] * (m1 / c1) / (jnp.sqrt(v1 / c2) + EPS)
            if sl is None:
                new_p[name], new_mu[name], new_nu[name] = p1, m1, v1
            else:
                upd = lambda d, v: d.at[:, sl[0]:sl[1]].set(v)
                new_p[name] = upd(new_p[name], p1)
                new_mu[name] = upd(new_mu[name], m1)
                new_nu[name] = upd(new_nu[name], v1)

        g2d_red = _ring_all_reduce_2d(g2d, n_tiles, n_data)
        new_stats = add_densification_stats(
            jax.tree.unflatten(stats_treedef, stats_leaves), g2d_red,
            radii_max,
        )

        # overflow gating: a truncated pair list voids the whole update
        gate = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ovf_g, b, a), new, old
        )
        return (
            gate(new_p, pdict), gate(new_mu, mu), gate(new_nu, nu),
            jnp.where(ovf_g, count, new_count),
            gate(tuple(jax.tree.leaves(new_stats)), stats_leaves),
            loss, ovf_g,
        )

    stats_leaves, stats_treedef = jax.tree.flatten(state.stats)
    pdict = params.param_pytree()
    repl = P()
    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(repl, repl, P("data"),
                  P("data", None, "tiles", None), P("data", "tiles", None),
                  repl, repl, repl, repl, repl, repl, repl),
        out_specs=(repl, repl, repl, repl, repl, repl, repl),
        check_vma=False,
    )(pdict, params.alive, cam_batch, gt_batch, gt_depth_batch, bg, mask,
      lrs, state.adam.mu, state.adam.nu, state.adam.count,
      tuple(stats_leaves))

    new_pdict, new_mu, new_nu, new_count, new_stats_leaves, loss, ovf = out
    return (
        TrainState(
            params=GaussianParams.from_param_pytree(new_pdict, params.alive),
            adam=AdamState(count=new_count, mu=new_mu, nu=new_nu),
            stats=jax.tree.unflatten(stats_treedef, list(new_stats_leaves)),
            step=jnp.where(ovf, state.step, it),
        ),
        loss,
        ovf,
    )
