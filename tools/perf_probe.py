"""Component-level on-device timing of the flagship predict config.

Single dispatches through the axon tunnel carry a ~50 ms host round-trip, so
naive per-op timing is meaningless. Each component is instead repeated R times
*inside one jit* with a serializing data dependency (carry chaining or an
epsilon perturbation derived from the previous output), and the per-call time
is the slope (t(R2) - t(R1)) / (R2 - R1) — dispatch overhead and the constant
part cancel.

Usage: python tools/perf_probe.py [--height 2752 --width 1856] [--r1 4 --r2 12]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np


def wall(fn, *args, iters=2):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0])  # flush tunnel
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def slope_time(make_scan, r1, r2, iters=2):
    """make_scan(reps) -> jitted zero-arg-result callable; returns s/call."""
    f1, a1 = make_scan(r1)
    f2, a2 = make_scan(r2)
    t1 = wall(f1, *a1, iters=iters)
    t2 = wall(f2, *a2, iters=iters)
    return (t2 - t1) / (r2 - r1)


def make_proj(B, width, height, v_off=0.0):
    p = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    p[:, 0, 0] = 2200.0
    p[:, 1, 1] = 2200.0
    p[:, 0, 2] = width / 2
    p[:, 1, 2] = height / 2
    p[:, 0, 3] = v_off
    return jnp.asarray(p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=2752)
    ap.add_argument("--width", type=int, default=1856)
    ap.add_argument("--r1", type=int, default=4)
    ap.add_argument("--r2", type=int, default=12)
    ap.add_argument("--only", default=None, help="comma list: feat,warp,cell,osm,match")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from adamvs_tpu.models.adamvs import correlation_volume, get_warp_fn
    from adamvs_tpu.nn.costreg import AdaRedCell, CostRegNet2D
    from adamvs_tpu.nn.featurenet import AdaFeatureNet
    from adamvs_tpu.ops.regression import online_softmax_init, online_softmax_update

    H, W = args.height, args.width
    B, V = 1, 5
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    stages = [
        (H // 4, W // 4, 32, 48, 8, True),
        (H // 2, W // 2, 16, 32, 8, True),
        (H, W, 8, 8, 8, False),
    ]
    rows = []

    def emit(name, t, n):
        rows.append((name, t, n))
        print(f"{name:58s} {t*1e3:10.2f} x{n:4d} {t*n*1e3:10.1f} ms", flush=True)

    # --- feature net, one frame, chained via input perturbation ---
    if only is None or "feat" in only:
        feat_net = AdaFeatureNet(8, num_stages=3)
        fvars = feat_net.init(key, jnp.zeros((1, 64, 96, 3)), False)
        img = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))

        def mk(reps):
            @jax.jit
            def run(v, x):
                def body(c, _):
                    out = feat_net.apply(v, x + c, False)
                    return jnp.mean(out["stage3"]) * 1e-30, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
                return c
            return run, (fvars, img)

        emit("featurenet 1 view", slope_time(mk, args.r1, args.r2), V)

    # --- warp per slice per view, chained via depth perturbation ---
    if only is None or "warp" in only:
        for si, (h, w, C, D, base, up) in enumerate(stages):
            feat = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
            sp = make_proj(B, w, h, 150.0 / (2 ** (2 - si)))
            rp = make_proj(B, w, h)
            depth = jnp.full((B, 1, h, w), 400.0, jnp.float32)
            for impl in ("gather", "banded", "pallas", "pallas2"):
                wf = get_warp_fn(impl)

                def mk(reps, wf=wf):
                    @jax.jit
                    def run(ft, s, r, d):
                        def body(c, _):
                            out = wf(ft, s, r, d + c)
                            return jnp.mean(out) * 1e-30, None
                        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
                        return c
                    return run, (feat, sp, rp, depth)

                try:
                    t = slope_time(mk, args.r1, args.r2)
                except Exception as e:  # noqa
                    print(f"s{si+1} warp/{impl} FAILED {type(e).__name__}: {e}", flush=True)
                    continue
                emit(f"s{si+1} warp/{impl} slice.view [{h}x{w}x{C}]", t, D * (V - 1))

    # --- AdaRedCell per slice, chained via the GRU carry ---
    if only is None or "cell" in only:
        for si, (h, w, C, D, base, up) in enumerate(stages):
            cell = AdaRedCell(base, up)
            cost = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
            carry0 = cell.init_carry(B, h, w)
            cvars = cell.init(key, cell.init_carry(B, 64, 96), jnp.zeros((B, 64, 96, C)))

            def mk(reps, cell=cell, cvars=cvars, carry0=carry0, cost=cost):
                @jax.jit
                def run(v, carry, x):
                    def body(c, _):
                        c, out = cell.apply(v, c, x)
                        return c, None
                    c, _ = jax.lax.scan(body, carry, None, length=reps)
                    return jax.tree_util.tree_map(jnp.mean, c)
                return run, (cvars, carry0, cost)

            emit(f"s{si+1} AdaRedCell slice [{h}x{w}x{C}]", slope_time(mk, args.r1, args.r2), D)

    # --- online softmax update, chained via acc ---
    if only is None or "osm" in only:
        for si, (h, w, C, D, base, up) in enumerate(stages):
            oh, ow = (2 * h, 2 * w) if up else (h, w)
            acc0 = online_softmax_init((B, oh, ow))
            cost = jnp.asarray(rng.randn(B, oh, ow).astype(np.float32))
            hyp = jnp.full((B, oh, ow), 400.0, jnp.float32)

            def mk(reps, acc0=acc0, cost=cost, hyp=hyp):
                @jax.jit
                def run(acc, c, hh):
                    def body(a, _):
                        return online_softmax_update(a, c + a[0] * 1e-30, hh), None
                    a, _ = jax.lax.scan(body, acc, None, length=reps)
                    return jax.tree_util.tree_map(jnp.mean, a)
                return run, (acc0, cost, hyp)

            emit(f"s{si+1} online_softmax [{oh}x{ow}]", slope_time(mk, args.r1, args.r2), D)

    # --- stage-1 per-view matching ---
    if only is None or "match" in only:
        h, w, C, D = stages[0][:4]
        ref = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
        src = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
        sp = make_proj(B, w, h, 37.5)
        rp = make_proj(B, w, h)
        hyp0 = jnp.tile(jnp.linspace(300.0, 500.0, D)[None], (B, 1))
        reg2d = CostRegNet2D(D)
        rvars = reg2d.init(key, jnp.zeros((B, 64, 96, D)), False)
        wf = get_warp_fn("banded")

        def mk(reps):
            @jax.jit
            def run(rv, ref, src, sp, rp, hyp):
                def body(c, _):
                    corr = correlation_volume(ref + c, src, sp, rp, hyp, 16, wf)
                    prob = jax.nn.softmax(reg2d.apply(rv, corr, False), axis=-1)
                    return jnp.mean(prob) * 1e-30, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
                return c
            return run, (rvars, ref, src, sp, rp, hyp0)

        emit(f"s1 per-view match (corr {D}d + reg2d)", slope_time(mk, 2, 6), V - 1)

    total = 0.0
    print(f"\n{'component':58s} {'t_one(ms)':>10s} {'xN':>5s} {'total(ms)':>10s}")
    for name, t, n in rows:
        counted = n if ("warp/" not in name or "/banded" in name) else 0
        tot = t * counted
        total += tot
        print(f"{name:58s} {t*1e3:10.2f} {n:5d} {tot*1e3:10.1f}")
    print(f"\nimplied model time (banded warp): {total:.3f} s -> {1/max(total,1e-9):.3f} maps/s")


if __name__ == "__main__":
    main()
