"""Attribute the stage-1 per-view matching time (tools/perf_probe.py showed
716 ms/view; its warp accounts for ~240 ms and the D=48 U-Net should be ~15 ms
at measured conv rates — find the remainder). Slope-timed on device."""

from __future__ import annotations

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
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def slope(mk, r1=3, r2=9):
    f1, a1 = mk(r1)
    f2, a2 = mk(r2)
    return (wall(f2, *a2) - wall(f1, *a1)) / (r2 - r1)


def rep(fn, reps, *args0):
    @jax.jit
    def run(*args):
        def body(c, _):
            out = fn(args[0] + c, *args[1:])
            return jnp.mean(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    return run, args0


def main():
    from adamvs_tpu.models.adamvs import correlation_volume, get_warp_fn
    from adamvs_tpu.nn.costreg import CostRegNet2D
    from adamvs_tpu.nn.featurenet import AdaFeatureNet

    H, W = 2752, 1856
    h, w, C, D = H // 4, W // 4, 32, 48
    B = 1
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    ref = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    src = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    p = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    p[:, 0, 0] = 2200.0; p[:, 1, 1] = 2200.0
    p[:, 0, 2] = w / 2; p[:, 1, 2] = h / 2
    rp = jnp.asarray(p)
    p2 = p.copy(); p2[:, 0, 3] = 37.5
    sp = jnp.asarray(p2)
    hyp0 = jnp.tile(jnp.linspace(300.0, 500.0, D)[None], (B, 1))
    wf = get_warp_fn("banded")

    # (a) correlation volume alone
    def corr_fn(ref, src, sp, rp, hyp):
        return correlation_volume(ref, src, sp, rp, hyp, 16, wf)
    t = slope(lambda r: rep(corr_fn, r, ref, src, sp, rp, hyp0))
    print(f"corr volume (48d, block16, banded): {t*1e3:9.2f} ms", flush=True)

    # (a2) correlation volume, block = D (no lax.map chunking)
    def corr_fn_full(ref, src, sp, rp, hyp):
        return correlation_volume(ref, src, sp, rp, hyp, 48, wf)
    t = slope(lambda r: rep(corr_fn_full, r, ref, src, sp, rp, hyp0))
    print(f"corr volume (block=48, one shot):   {t*1e3:9.2f} ms", flush=True)

    # (b) reg2d U-Net alone on [B,h,w,48]
    reg2d = CostRegNet2D(D)
    rvars = reg2d.init(key, jnp.zeros((B, 64, 96, D)), False)
    corr = jnp.asarray(rng.randn(B, h, w, D).astype(np.float32))
    t = slope(lambda r: rep(lambda x: reg2d.apply(rvars, x, False), r, corr))
    print(f"reg2d U-Net [B,{h},{w},48]:         {t*1e3:9.2f} ms", flush=True)

    # (c) softmax + conf/depth stats
    def stats(score, hyp):
        prob = jax.nn.softmax(score, axis=-1)
        return jnp.max(prob, axis=-1), jnp.sum(prob * hyp[:, None, None, :], axis=-1)
    t = slope(lambda r: rep(lambda s: stats(s, hyp0), r, corr))
    print(f"softmax+stats:                      {t*1e3:9.2f} ms", flush=True)

    # (d) featurenet one frame, more reps for signal
    feat_net = AdaFeatureNet(8, num_stages=3)
    fvars = feat_net.init(key, jnp.zeros((1, 64, 96, 3)), False)
    img = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    t = slope(lambda r: rep(lambda x: feat_net.apply(fvars, x, False), r, img), r1=3, r2=9)
    print(f"featurenet 1 frame full res:        {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
