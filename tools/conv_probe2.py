"""Probe alternative small-channel conv formulations on TPU.

The standard NHWC conv with C=8 is lane-padding-bound (tools/conv_probe.py:
295 GFLOP/s, ~16x bandwidth waste). Candidates:
(a) NCHW conv (spatial in lanes)
(b) 1x1 conv as [C,HW] matmul, W in lanes
(c) 3x3 conv as 9 shifted [Cout,Cin]x[Cin,HW] matmuls (spatial in lanes)
(d) space-to-depth 2x2 packed conv (C 8->32 at quarter area)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=5, reps=4):
    for _ in range(2):
        sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / reps)
    return float(np.median(ts))


def main():
    rng = np.random.RandomState(0)
    H, W, C = 2752, 1856, 8
    gf = 2 * H * W * 9 * C * C / 1e9

    x_nhwc = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, C, C) * 0.1, jnp.float32)

    @jax.jit
    def conv_nchw(x, k):
        # x [1,C,H,W], k [Cout,Cin,3,3]
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )

    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    k_oihw = jnp.transpose(k, (3, 2, 0, 1))
    t = timeit(conv_nchw, x_nchw, k_oihw)
    print(f"(a) NCHW conv:            {t * 1e3:7.2f} ms  {gf / t:7.1f} GFLOP/s")

    # (b) 1x1 matmul, spatial in lanes
    xm = x_nchw.reshape(C, H * W)
    w1 = jnp.asarray(rng.randn(C, C) * 0.1, jnp.float32)

    @jax.jit
    def mm(w, xm):
        return jnp.dot(w, xm, preferred_element_type=jnp.float32)

    t = timeit(mm, w1, xm)
    gf1 = 2 * H * W * C * C / 1e9
    print(f"(b) 1x1 [C,HW] matmul:    {t * 1e3:7.2f} ms  {gf1 / t:7.1f} GFLOP/s")

    # (c) 3x3 as 9 shifted matmuls on [C, H, W] (pad W once, roll rows)
    @jax.jit
    def conv_shift(x, k):
        # x [C,H,W]; k [3,3,Cin,Cout]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
        out = jnp.zeros((k.shape[3], H, W), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.dynamic_slice(xp, (0, dy, dx), (C, H, W))
                out = out + jnp.einsum(
                    "io,ihw->ohw", k[dy, dx], xs,
                    preferred_element_type=jnp.float32,
                )
        return out

    t = timeit(conv_shift, x_nchw[0], k)
    print(f"(c) 9-shift matmul conv:  {t * 1e3:7.2f} ms  {gf / t:7.1f} GFLOP/s")

    # (d) space-to-depth 2x2: [H/2, W/2, 4C] conv 3x3 (superset of true deps)
    x_s2d = (
        x_nhwc.reshape(1, H // 2, 2, W // 2, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(1, H // 2, W // 2, 4 * C)
    )
    k4 = jnp.asarray(rng.randn(3, 3, 4 * C, 4 * C) * 0.1, jnp.float32)

    @jax.jit
    def conv_s2d(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    t = timeit(conv_s2d, x_s2d, k4)
    print(f"(d) s2d 2x2 packed conv:  {t * 1e3:7.2f} ms  (true-work {gf / t:7.1f} GFLOP/s)")

    # (e) like (c) but bf16 operands
    t = timeit(conv_shift, x_nchw[0].astype(jnp.bfloat16), k.astype(jnp.bfloat16))
    print(f"(e) 9-shift matmul bf16:  {t * 1e3:7.2f} ms  {gf / t:7.1f} GFLOP/s")


if __name__ == "__main__":
    main()
