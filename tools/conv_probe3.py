"""Slope-timed conv implementation shootout on the real TPU.

Round 1 concluded stock XLA NHWC convs at C=8..48 run at ~300 GFLOP/s and
built FastConv (shift-einsum) on that; those timings predate the discovery of
the ~50 ms axon dispatch floor, so re-measure both paths with on-device scan
repetition (see tools/perf_probe.py for the methodology).

Usage: python tools/conv_probe3.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

from adamvs_tpu.nn.fastconv import conv2d_shift


def wall(fn, *args, iters=2):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = np.asarray(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def slope(mk, r1=4, r2=12):
    f1, a1 = mk(r1)
    f2, a2 = mk(r2)
    return (wall(f2, *a2) - wall(f1, *a1)) / (r2 - r1)


def stock_conv(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def main():
    rng = np.random.RandomState(0)
    H, W = 1376, 928  # stage-2 size; big enough to be compute-bound
    cases = [(8, 8), (16, 8), (16, 16), (32, 32), (48, 48), (64, 64), (128, 128)]
    print(f"{'Cin->Co':>9s} {'dtype':>6s} {'stock(ms)':>10s} {'shift(ms)':>10s} "
          f"{'GF':>7s} {'stockTF/s':>9s} {'shiftTF/s':>9s}")
    for Ci, Co in cases:
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.randn(1, H, W, Ci).astype(np.float32)).astype(dt)
            k = jnp.asarray(rng.randn(3, 3, Ci, Co).astype(np.float32) * 0.1).astype(dt)
            gf = 2 * 9 * Ci * Co * H * W / 1e9

            def mk_stock(reps):
                @jax.jit
                def run(x, k):
                    def body(c, _):
                        y = stock_conv(x + c.astype(dt), k)
                        return jnp.mean(y).astype(jnp.float32) * 1e-30, None
                    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
                    return c
                return run, (x, k)

            def mk_shift(reps):
                @jax.jit
                def run(x, k):
                    def body(c, _):
                        y = conv2d_shift(x + c.astype(dt), k)
                        return jnp.mean(y).astype(jnp.float32) * 1e-30, None
                    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
                    return c
                return run, (x, k)

            ts = slope(mk_stock)
            th = slope(mk_shift)
            name = "f32" if dt == jnp.float32 else "bf16"
            print(f"{Ci:>4d}->{Co:<4d} {name:>6s} {ts*1e3:10.3f} {th*1e3:10.3f} "
                  f"{gf:7.2f} {gf/ts/1e3:9.2f} {gf/th/1e3:9.2f}", flush=True)


if __name__ == "__main__":
    main()
