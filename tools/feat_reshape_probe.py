"""Repro: AdaFeatureNet + (B,V) output reshape layout pathology.

In the full model the feature net runs on [B*V,H,W,C] then reshapes outputs
to [B,V,...]. With the stage-3 out conv on the stock path, XLA fuses the
reshape into the conv (convolution_bitcast_fusion) and assigns a (B,C)
(8,128)-tiled layout — 12.8-25.6x padding, 19.5G HBM, OOM at bench shapes.
This probe times variants: plain reshape vs optimization_barrier before the
reshape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adamvs_tpu.nn.featurenet import AdaFeatureNet

    H, W, V = 2752, 1856, 5
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(V, H, W, 3).astype(np.float32))
    net = AdaFeatureNet(dtype=jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x[:1, :64, :96])

    def run(tag, barrier):
        @jax.jit
        def fwd(v, x):
            out = net.apply(v, x, train=False)
            if barrier:
                out = jax.lax.optimization_barrier(out)
            out = {k: o.reshape((1, V) + o.shape[1:]) for k, o in out.items()}
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out.values())

        try:
            float(fwd(variables, x))
            t0 = time.time()
            for _ in range(3):
                r = float(fwd(variables, x))
            print(f"{tag}: {(time.time()-t0)/3*1000:.1f} ms")
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")

    run("reshape-plain  ", False)
    run("reshape-barrier", True)


if __name__ == "__main__":
    main()
