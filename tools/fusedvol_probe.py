"""Probe: single-chip fused-volume sweep (depth_mesh over 1 device) vs the
default streamed scan at bench shapes. The fused path materializes the
visibility-weighted volume per stage (all warps batched in one kernel call)
and scans the regularizer over the precomputed slices — measures how much of
the streamed path's cost is per-step warp dispatch + layout formatting.

Usage: python tools/fusedvol_probe.py [--warp_impl pallas2bf16] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warp_impl", default="pallas2bf16")
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from adamvs_tpu.models import build_model
    from bench import make_inputs

    h, w, nd = (704, 480, 96) if args.small else (2752, 1856, 192)
    kw = {"warp_impl": args.warp_impl}
    if args.dtype == "bf16":
        kw["dtype"] = jnp.bfloat16
    mesh = Mesh(np.array(jax.devices()[:1]), ("depth",))
    model = build_model("adamvs", depth_mesh=mesh, **kw)
    imgs, projs, dv = make_inputs(h, w, 5, 1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 64, 96, 3), jnp.float32),
        projs, dv, num_depth=nd,
    )

    @jax.jit
    def fwd(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False, num_depth=nd)
        return out["depth"], out["photometric_confidence"]

    d, p = fwd(variables, imgs, projs, dv)
    _ = float(jnp.sum(d))
    times = []
    for _i in range(args.iters):
        t0 = time.perf_counter()
        d, p = fwd(variables, imgs, projs, dv)
        _ = float(jnp.sum(d))
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    print(f"fusedvol {args.warp_impl}/{args.dtype}: {sec:.3f}s/map = {1/sec:.4f} maps/s")


if __name__ == "__main__":
    main()
