"""Probe XLA TPU conv efficiency vs channel count / dtype / packing.

Hypothesis: tiny-channel NHWC convs (C=8) lane-pad to 128 and waste both
bandwidth and MXU; space-to-depth packing (H/2,W/2,4C) should recover it.
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
    H, W = 2752, 1856
    print(f"# 3x3 conv, {H}x{W} spatial, same total element count per row")
    for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        for c, scale in [(8, 1), (16, 1), (32, 2), (64, 2), (128, 4)]:
            h, w = H // scale, W // scale
            x = jnp.asarray(rng.randn(1, h, w, c), dt)
            k = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, dt)

            @jax.jit
            def conv(x, k):
                return jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )

            t = timeit(conv, x, k)
            gf = 2 * h * w * 9 * c * c / 1e9
            gb = (2 * h * w * c + h * w * c) * x.dtype.itemsize / 1e9
            print(
                f"{dt_name} C={c:4d} {h}x{w}: {t * 1e3:7.2f} ms  "
                f"{gf / t:8.1f} GFLOP/s  {gb / t:6.1f} GB/s(min)"
            )


if __name__ == "__main__":
    main()
