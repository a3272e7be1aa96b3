"""Microbenchmark the plane-sweep warp implementations at per-stage shapes.

Times ONE warp call (all source views, one depth slice) per cascade stage at
the flagship full-res predict geometry, for each implementation, plus the
regularizer cell step and feature net for context. Run on the real TPU:

    python tools/warp_microbench.py [--impl pallas,banded,gather] [--dtype f32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    # block_until_ready does not flush the axon relay; fetching a
    # device-reduced scalar guarantees completion (see bench.py)
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, *args, iters=5, warmup=2, reps=4):
    """Median seconds per call; ``reps`` back-to-back dispatches per sync
    amortize the relay round-trip out of the measurement."""
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / reps)
    return float(np.median(ts))


def proj_pair(width, height, shift):
    r = np.eye(4, dtype=np.float32)
    r[0, 0] = r[1, 1] = 2200.0
    r[0, 2] = width / 2
    r[1, 2] = height / 2
    s = r.copy()
    s[0, 3] = shift
    return jnp.asarray(s)[None], jnp.asarray(r)[None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="pallas2,pallas,banded")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    from adamvs_tpu.models.adamvs import get_warp_fn

    H, W = 2752, 1856
    stages = [
        ("stage1", H // 4, W // 4, 32),
        ("stage2", H // 2, W // 2, 16),
        ("stage3", H, W, 8),
    ]
    rng = np.random.RandomState(0)
    print(f"# full-res predict geometry {H}x{W}, dtype={args.dtype}")
    for impl in args.impls.split(","):
        warp = get_warp_fn(impl)
        for name, h, w, c in stages:
            feat = jnp.asarray(rng.randn(1, h, w, c), dt)
            sp, rp = proj_pair(w, h, 150.0)
            depth = jnp.full((1, 1, h, w), 400.0, jnp.float32)

            @jax.jit
            def one(f, s, r, d, warp=warp):
                return warp(f, s, r, d)

            t = timeit(one, feat, sp, rp, depth, iters=args.iters)
            px = h * w
            print(
                f"{impl:8s} {name}: {t * 1e3:8.2f} ms/slice/view "
                f"({px / t / 1e9:.2f} Gpix/s)"
            )

    # context: one AdaRedCell step at stage3 full res
    from adamvs_tpu.nn.costreg import AdaRedCell

    cell = AdaRedCell(8, up=False, dtype=dt if args.dtype == "bf16" else None)
    x = jnp.asarray(rng.randn(1, H, W, 8), dt)
    carry = cell.init_carry(1, H, W, dt)
    variables = cell.init(jax.random.PRNGKey(0), carry, x)
    step = jax.jit(lambda v, cr, xx: cell.apply(v, cr, xx))
    t = timeit(step, variables, carry, x, iters=args.iters)
    print(f"adared_cell stage3 step: {t * 1e3:8.2f} ms")

    from adamvs_tpu.nn.featurenet import AdaFeatureNet

    fn = AdaFeatureNet(8, num_stages=3, dtype=dt if args.dtype == "bf16" else None)
    img = jnp.asarray(rng.randn(1, H, W, 3), dt)
    fvars = fn.init(jax.random.PRNGKey(0), img, False)
    ffwd = jax.jit(lambda v, im: fn.apply(v, im, False))
    t = timeit(ffwd, fvars, img, iters=args.iters)
    print(f"featurenet full-res/view: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
