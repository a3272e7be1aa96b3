"""Benchmark: streaming full-resolution depth-map inference throughput.

Measures the flagship configuration from BASELINE.json configs[1]/[4]: Ada-MVS
3-stage cascade (48/32/8 hypotheses), 5 views, WHU_OMVS half-res predict
geometry (2752x1856 after the 0.5x resize of 5504x3712 aerial frames,
predict_whu.py:30-41), numdepth=192 — one full depth map per iteration on one
chip, steady-state.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "depth_maps/s/chip", "vs_baseline": N}

``vs_baseline`` compares against the PyTorch reference on a datacenter GPU.
The reference repo publishes no throughput (BASELINE.md); the constant below
is an estimate for the reference's streaming predict path (python-loop GRU
over 192+48 depth slices x 3 stages at this resolution on a V100/3090-class
GPU, ~10 s per view): 0.1 depth-maps/s. The north-star target is >=5x this.

Usage: python bench.py [--small] [--iters N] [--model adamvs|msrednet]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# amortize the (remote) TPU compile across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

REF_GPU_DEPTH_MAPS_PER_S = 0.1  # documented estimate, see module docstring


def run_bench(height, width, views, numdepth, iters, model_name, warmup=1,
              warp_impl="gather", dtype=None, batch=1, bands=None):
    import jax
    import jax.numpy as jnp

    from adamvs_tpu.models import build_model

    kw = {"warp_impl": warp_impl}
    if bands is not None:
        kw["warp_bands"] = tuple(bands)
    if dtype == "bf16":
        kw["dtype"] = jnp.bfloat16
    model = build_model(model_name, **kw)
    rng = np.random.RandomState(0)
    B, V = batch, views
    imgs = jnp.asarray(rng.randn(B, V, height, width, 3).astype(np.float32))
    proj = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    # plausible aerial camera geometry (focal ~2200px at half-res, small baselines)
    for v in range(V):
        proj[:, v, 0, 0] = 2200.0
        proj[:, v, 1, 1] = 2200.0
        proj[:, v, 0, 2] = width / 2
        proj[:, v, 1, 2] = height / 2
        proj[:, v, 0, 3] = 150.0 * v
    projs = {}
    for k in (1, 2, 3):
        s = 2 ** (3 - k)
        p = proj.copy()
        p[:, :, :2, :] /= s
        projs[f"stage{k}"] = jnp.asarray(p)
    dv = jnp.asarray(np.tile(np.array([[300.0, 500.0]], np.float32), (B, 1)))

    # conv params are spatial-size-independent: init cheaply at a small size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, V, 64, 96, 3), jnp.float32),
        projs, dv, num_depth=numdepth,
    )

    @jax.jit
    def fwd(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False, num_depth=numdepth)
        return out["depth"], out["photometric_confidence"]

    def sync(x):
        # block_until_ready alone does not flush execution through the axon
        # relay; fetching a device-reduced scalar guarantees completion
        return float(jnp.sum(x))

    for _ in range(warmup):
        d, p = fwd(variables, imgs, projs, dv)
        sync(d)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        d, p = fwd(variables, imgs, projs, dv)
        sync(d)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="reduced-size smoke config")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--model", default="adamvs")
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--numdepth", type=int, default=192)
    ap.add_argument("--warp_impl", default="banded", choices=["gather", "banded", "pallas", "pallas2"])
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--batch", type=int, default=1,
                    help="frames per step; amortizes the serial depth recurrence")
    ap.add_argument("--bands", default=None,
                    help="row_band,col_band for banded/pallas warps (e.g. 16,128)")
    args = ap.parse_args()

    if args.small:
        h, w, nd = 704, 480, 96
    else:
        h, w, nd = 2752, 1856, args.numdepth
    if args.height:
        h = args.height
    if args.width:
        w = args.width

    sec_per_batch = run_bench(
        h, w, 5, nd, args.iters, args.model,
        warp_impl=args.warp_impl, dtype=args.dtype, batch=args.batch,
        bands=[int(x) for x in args.bands.split(",")] if args.bands else None,
    )
    maps_per_s = args.batch / sec_per_batch
    result = {
        "metric": f"{args.model}_predict_{h}x{w}_d{nd}_depth_maps_per_s_per_chip",
        "value": round(maps_per_s, 5),
        "unit": "depth_maps/s/chip",
        "vs_baseline": round(maps_per_s / REF_GPU_DEPTH_MAPS_PER_S, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
