"""Regenerate the stored accuracy goldens under tests/goldens/.

The predict golden is the depth + confidence output of a seed-0-initialized
2-stage AdaMVS on the synthetic fixture scene (the CPU-runnable config of
BASELINE.json configs[0]): any silent change to the math — warp conventions,
sampler endpoints, GRU formulas, softmax stabilization — moves it, while
finiteness/shape tests would not notice. Regenerate ONLY when an intentional
numeric change is made, and note the reason in the commit message.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "goldens")


def golden_forward():
    """The pinned golden configuration. Shared with tests/test_golden.py.

    One deterministic forward of a seed-0 model whose params are scaled x4:
    at plain random init the regularized costs are near-uniform, so depth
    collapses to the constant window center — no spatial structure, nothing
    for per-pixel math breaks to perturb. Scaling the init sharpens the
    softmax (depth std ~11 scene units, range ~90) while staying a single
    forward pass — unlike a trained golden, there is no optimizer trajectory
    to amplify float-reassociation noise across XLA/impl changes."""
    sys.path.insert(0, os.path.join(os.path.dirname(GOLDEN_DIR)))
    from adamvs_tpu.data.synthetic import make_scene
    from adamvs_tpu.models import AdaMVS
    from tests.test_models import scene_batch

    scene = make_scene(num_views=4, height=96, width=128, seed=0)
    imgs, projs, dv = scene_batch(scene)
    model = AdaMVS(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4,
                   cr_base=(4, 4), warp_impl="gather")
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv)
    variables = {
        "params": jax.tree_util.tree_map(lambda x: x * 4.0, variables["params"]),
        "batch_stats": variables["batch_stats"],
    }
    out = model.apply(variables, imgs, projs, dv, train=False)
    return (np.asarray(out["depth"], np.float32),
            np.asarray(out["photometric_confidence"], np.float32),
            scene)


def main():
    depth, conf, scene = golden_forward()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, "adamvs_predict_golden.npz")
    np.savez_compressed(path, depth=depth, conf=conf,
                        interval=np.float32(scene.depth_interval))
    print(f"wrote {path}: depth {depth.shape} "
          f"[{depth.min():.3f}, {depth.max():.3f}], conf mean {conf.mean():.4f}")


if __name__ == "__main__":
    main()
