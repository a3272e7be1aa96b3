"""A/B the AdaFeatureNet forward at bench shape: shift-einsum convs (default
dispatch) vs stock XLA convs (ADAMVS_NO_SHIFT_CONV=1), f32 vs bf16.

The round-5 trace attribution shows the feature pass at 0.433 s of the
2.09 s/map device time (tools/trace_attrib.py, reg_impl=pallas) — mostly
slice/pad/convolution-fusion ops from the full-res 8-channel trunk convs
(reference FeatureNet0, adamvs.py:49-152). This probe times the feature
net in isolation so impl choices are attributable.

Usage: python tools/feature_probe.py [--iters 4] [--height H --width W]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--height", type=int, default=2752)
    ap.add_argument("--width", type=int, default=1856)
    ap.add_argument("--views", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from adamvs_tpu.nn.featurenet import AdaFeatureNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.randn(args.views, args.height, args.width, 3).astype(np.float32))

    for dtype in (jnp.bfloat16, jnp.float32):
        net = AdaFeatureNet(dtype=dtype)
        variables = net.init(jax.random.PRNGKey(0), x[:1, :64, :96])

        @jax.jit
        def fwd(v, x):
            out = net.apply(v, x, train=False)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out.values())

        # float() fetch: block_until_ready alone does not flush execution
        # through the axon relay (see bench.py sync())
        float(fwd(variables, x))
        t0 = time.time()
        for _ in range(args.iters):
            r = float(fwd(variables, x))
        dt = (time.time() - t0) / args.iters
        shift = "off" if os.environ.get("ADAMVS_NO_SHIFT_CONV") else "on"
        print(f"dtype={jnp.dtype(dtype).name:9s} shift={shift:3s} "
              f"{dt*1000:8.1f} ms  ({dt/args.views*1000:.1f} ms/view)")


if __name__ == "__main__":
    main()
