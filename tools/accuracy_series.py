"""Cross-round accuracy regression series (VERDICT r4 next-round #6).

Trains a family (adamvs | msrednet) to convergence on a FIXED synthetic
corpus (4 train scenes + 2 held-out scenes, 128x160, full 3-stage cascade
scaled to 16/8/4 hypotheses) and reports the reference metrics — interval-
trimmed MAE (utils.py:308-315) and <1/<3-interval completeness
(utils.py:286-304) — as one JSON line. Seeds are pinned, so the number is
comparable across rounds; record it in BASELINE.md each round.

Run from the repo root (real TPU):   python tools/accuracy_series.py --model adamvs
CPU (slow, for wiring checks):       env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
                                         python tools/accuracy_series.py --epochs 2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


TRAIN_SEEDS = (0, 1, 2, 3)
HELDOUT_SEEDS = (10, 11)
H, W = 128, 160
NDEPTHS = (16, 8, 4)
RATIOS = (4.0, 2.0, 1.0)
VIEWS = 5


def scene_to_batch(scene, jnp):
    from adamvs_tpu.data.pipeline import center_image
    from adamvs_tpu.geom.camera import proj_matrix, stage_proj_matrices

    views = scene.views[:VIEWS]
    imgs = np.stack([center_image(v.image) for v in views])[None]
    proj = np.stack([proj_matrix(v.camera) for v in views])
    projs = {k: jnp.asarray(v[None]) for k, v in stage_proj_matrices(proj).items()}
    dv = np.array(
        [[scene.depth_start, scene.depth_end, scene.depth_interval]], np.float32
    )
    gt = scene.views[0].depth[None].astype(np.float32)
    mask = ((gt >= scene.depth_start) & (gt <= scene.depth_end)).astype(np.float32)
    return {
        "imgs": jnp.asarray(imgs),
        "proj_matrices": projs,
        "depth_values": jnp.asarray(dv),
        # NEAREST downsampling, as the reference GT pyramid (cas_total_rscv.py:529-533)
        "depth": {"stage1": jnp.asarray(gt[:, ::4, ::4]),
                  "stage2": jnp.asarray(gt[:, ::2, ::2]),
                  "stage3": jnp.asarray(gt)},
        "mask": {"stage1": jnp.asarray(mask[:, ::4, ::4]),
                 "stage2": jnp.asarray(mask[:, ::2, ::2]),
                 "stage3": jnp.asarray(mask)},
        "depth_interval": jnp.asarray([scene.depth_interval], np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="adamvs", choices=["adamvs", "msrednet"])
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from adamvs_tpu.data.synthetic import make_scene
    from adamvs_tpu.models import build_model, model_loss
    from adamvs_tpu.train import (
        create_train_state, make_eval_step, make_optimizer, make_train_step,
    )

    train_batches = [
        scene_to_batch(make_scene(num_views=VIEWS, height=H, width=W, seed=s), jnp)
        for s in TRAIN_SEEDS
    ]
    held_batches = [
        scene_to_batch(make_scene(num_views=VIEWS, height=H, width=W, seed=s), jnp)
        for s in HELDOUT_SEEDS
    ]

    model = build_model(
        args.model, ndepths=NDEPTHS, depth_intervals_ratio=RATIOS, base=8,
        cr_base=(8, 8, 8),
    )
    b0 = train_batches[0]
    variables = model.init(
        jax.random.PRNGKey(0), b0["imgs"], b0["proj_matrices"], b0["depth_values"]
    )
    state = create_train_state(model, variables, make_optimizer(lr=args.lr))
    tstep = make_train_step(model_loss(args.model), (0.5, 1.0, 2.0))
    estep = make_eval_step(model_loss(args.model), (0.5, 1.0, 2.0), 3)

    t0 = time.time()
    last_loss = None
    for epoch in range(args.epochs):
        for b in train_batches:
            state, metrics, _ = tstep(state, b)
        last_loss = float(metrics["loss"])
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            print(f"# epoch {epoch}: loss={last_loss:.4f}", file=sys.stderr)

    def eval_set(batches):
        keys = ("abs_depth_error", "thres1interval_error", "thres3interval_error")
        acc = {k: 0.0 for k in keys}
        for b in batches:
            m, _, _ = estep(state, b)
            for k in keys:
                acc[k] += float(m[k])
        return {k: round(v / len(batches), 5) for k, v in acc.items()}

    result = {
        "metric": f"{args.model}_accuracy_series_{H}x{W}_nd{'-'.join(map(str, NDEPTHS))}",
        "epochs": args.epochs,
        "final_train_loss": round(last_loss, 5),
        "train": eval_set(train_batches),
        "heldout": eval_set(held_batches),
        "train_seconds": round(time.time() - t0, 1),
        "nan_steps": int(state.nan_steps),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
