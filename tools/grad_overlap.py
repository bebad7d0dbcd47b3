"""Gradient all-reduce overlap evidence (SURVEY §7.9 / north-star config 5).

Multi-chip hardware is not reachable from this environment, but XLA's TPU
compiler IS: this script AOT-compiles the full dp x tiles sharded training
step against a device-less v5e 2x2 topology (jax.experimental.topologies)
and inspects the optimized HLO schedule for ASYNC collectives:

* ``all-reduce-start`` / ``all-reduce-done`` pairs are XLA's async
  collective form — every instruction scheduled between start and done
  (fusions, sorts, custom-calls) runs while the ICI transfer is in flight;
* the script reports each async pair, the number and flop-carrying kinds of
  ops scheduled inside the window, and the total bytes in flight — the
  structural proof that the parameter-gradient reduction rides the ICI
  concurrently with the remaining backward work rather than serializing.

Run:  python tools/grad_overlap.py  (any host; no TPU chips needed)
"""
import re

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_step(mesh, P_cap, H, W, data, pair_cap):
    from luciddreamer_tpu.config import GSConfig
    from luciddreamer_tpu.parallel.sharded import sharded_train_step_batch
    from luciddreamer_tpu.core.types import Camera

    cfg = GSConfig()

    def step(state, cam_batch, gt):
        return sharded_train_step_batch(
            state, cam_batch, gt, jnp.zeros(3), mesh, cfg, extent=1.0,
            chunk=128, pair_cap=pair_cap, backend="pallas",
        )

    return step


def abstract_state(P_cap, n_rest=15):
    from luciddreamer_tpu.core.types import GaussianParams
    from luciddreamer_tpu.model.gaussians import DensifyStats
    from luciddreamer_tpu.model.optim import adam_init
    from luciddreamer_tpu.train.loop import TrainState

    f32 = jnp.float32
    sds = lambda shape, dt=f32: jax.ShapeDtypeStruct(shape, dt)
    params = GaussianParams(
        xyz=sds((P_cap, 3)), features_dc=sds((P_cap, 1, 3)),
        features_rest=sds((P_cap, n_rest, 3)), scaling=sds((P_cap, 3)),
        rotation=sds((P_cap, 4)), opacity=sds((P_cap, 1)),
        alive=sds((P_cap,), jnp.bool_),
    )
    pd = params.param_pytree()
    adam = jax.eval_shape(adam_init, pd)
    stats = jax.eval_shape(lambda: DensifyStats.zero(P_cap))
    return TrainState(params=params, adam=adam, stats=stats,
                      step=sds((), jnp.int32))


def abstract_cam(data, H, W):
    from luciddreamer_tpu.core.types import Camera

    f32 = jnp.float32
    sds = lambda shape: jax.ShapeDtypeStruct(shape, f32)
    return Camera(
        viewmatrix=sds((data, 4, 4)), projmatrix=sds((data, 4, 4)),
        campos=sds((data, 3)), tanfovx=sds((data,)), tanfovy=sds((data,)),
        height=H, width=W,
    )


def analyze(hlo: str, kinds=("all-reduce", "collective-permute")):
    """Find async collective start/done windows in the scheduled HLO and
    summarize the work overlapped inside each."""
    lines = hlo.splitlines()
    pairs = []
    open_ar = {}
    interesting = re.compile(
        r"(fusion|sort|custom-call|gather|scatter|while|convolution|dot)"
    )
    start_pat = re.compile(
        r"%?((?:" + "|".join(kinds) + r")-start[.\d]*) =|"
        r"= .*%?((?:" + "|".join(kinds) + r")-start[.\d]*)\b"
    )
    for i, ln in enumerate(lines):
        if "= " not in ln:
            continue
        ms = re.match(r"\s*%?((?:" + "|".join(kinds) + r")-start[.\d]*) =",
                      ln)
        if ms:
            open_ar[ms.group(1)] = (i, ln)
            continue
        md = re.match(r"\s*%?\S*(?:" + "|".join(kinds) + r")-done", ln)
        if md:
            src = re.search(r"\(%?((?:" + "|".join(kinds)
                            + r")-start[.\d]*)\)", ln)
            if src and src.group(1) in open_ar:
                j, start_ln = open_ar.pop(src.group(1))
                inner = [
                    l for l in lines[j + 1 : i] if interesting.search(l)
                    and "= " in l
                ]
                shapes = re.findall(r"f32\[([\d,]+)\]", start_ln)
                nbytes = sum(
                    4 * int(np.prod([int(d) for d in s.split(",") if d]))
                    for s in shapes
                )
                pairs.append(
                    dict(kind=start_ln.strip().split(" = ")[0].lstrip("%"),
                         start=j, done=i, n_inner=len(inner),
                         bytes=nbytes, inner_kinds=sorted(
                             {interesting.search(l).group(1) for l in inner}
                         ))
                )
    return pairs


def build_overlapped_step(mesh, pair_cap):
    from luciddreamer_tpu.config import GSConfig
    from luciddreamer_tpu.parallel.overlap import (
        sharded_train_step_overlapped,
    )

    cfg = GSConfig()

    def step(state, cam_batch, gt):
        return sharded_train_step_overlapped(
            state, cam_batch, gt, jnp.zeros(3), mesh, cfg, extent=1.0,
            chunk=128, pair_cap=pair_cap, backend="pallas",
        )

    return step


def compile_for_topology(step, mesh, P_cap, H, W, data):
    st = abstract_state(P_cap)
    cam = abstract_cam(data, H, W)
    repl = NamedSharding(mesh, P())
    shard = lambda tree: jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl)
        if hasattr(s, "shape") else s, tree,
    )
    cam_sh = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, P("data"))
        ),
        cam,
    )
    gt_sh = jax.ShapeDtypeStruct(
        (data, 3, H, W), jnp.float32,
        sharding=NamedSharding(mesh, P("data", None, "tiles", None)),
    )
    with mesh:
        return jax.jit(step).lower(shard(st), cam_sh, gt_sh).compile()


def report(name, hlo):
    pairs = analyze(hlo)
    n_sync_ar = len([l for l in hlo.splitlines()
                     if re.search(r"= \S+ all-reduce\(", l)])
    print(f"== {name}: {len(hlo.splitlines())} HLO lines, "
          f"{len(pairs)} async collective window(s), "
          f"{n_sync_ar} sync all-reduce(s)")
    total_inner = 0
    total_bytes = 0
    for p in pairs:
        total_inner += p["n_inner"]
        total_bytes += p["bytes"]
        if p["n_inner"]:
            print(f"   {p['kind']}@{p['start']}->@{p['done']}: "
                  f"{p['bytes']/1e6:.2f} MB in flight, "
                  f"{p['n_inner']} ops inside "
                  f"({', '.join(p['inner_kinds'])})")
    print(f"   total: {total_bytes/1e6:.1f} MB through async windows, "
          f"{total_inner} compute ops overlapped")
    return pairs, total_inner


def main():
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    devs = np.asarray(topo.devices).reshape(2, 2)
    mesh = Mesh(devs, ("data", "tiles"))
    P_cap, H, W = 100_000, 512, 512
    pair_cap = 400_000

    step = build_step(mesh, P_cap, H, W, 2, pair_cap)
    hlo = compile_for_topology(step, mesh, P_cap, H, W, 2).as_text()
    _, inner_auto = report("autodiff step (XLA psum)", hlo)

    step_o = build_overlapped_step(mesh, pair_cap)
    hlo_o = compile_for_topology(step_o, mesh, P_cap, H, W, 2).as_text()
    pairs_o, inner_ovl = report("manual chunked-ring step", hlo_o)

    if inner_ovl > inner_auto:
        print("VERDICT: the chunked-ring step overlaps its gradient "
              "reduction with compute (async collective-permute windows "
              "contain real work); the autodiff psum does not.")
    elif inner_auto > 0:
        print("VERDICT: XLA already overlaps the autodiff psum.")
    else:
        print("VERDICT: neither variant shows overlap in this build — "
              "inspect the dumped HLO.")


if __name__ == "__main__":
    main()
