"""Benchmark: streaming full-resolution depth-map inference throughput.

Measures the flagship configuration from BASELINE.json configs[1]/[4]: Ada-MVS
3-stage cascade (48/32/8 hypotheses), 5 views, WHU_OMVS half-res predict
geometry (2752x1856 after the 0.5x resize of 5504x3712 aerial frames,
predict_whu.py:30-41), numdepth=192 — one full depth map per iteration on one
chip, steady-state.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "depth_maps/s/chip",
     "vs_baseline": N, "tflops_per_s": N, ...}

``vs_baseline`` compares against the PyTorch reference on a datacenter GPU.
The reference publishes no throughput; see BASELINE.md "Throughput baseline
derivation" for the arithmetic behind REF_GPU_DEPTH_MAPS_PER_S (model FLOPs
from XLA cost analysis x an assumed reference-GPU efficiency). The north-star
target is >=5x it. ``tflops_per_s`` / ``hbm_gbps`` are the roofline
cross-check: achieved = XLA-counted flops (or bytes) / measured time, so the
headline number also stands alone against the chip peak (TPU v5e: ~197 bf16 /
~49 f32 TFLOP/s, ~819 GB/s HBM).

``--selftest`` additionally verifies warp-kernel numerics ON DEVICE: each
selectable warp impl is compared against the exact XLA gather warp at every
cascade stage's true shape/geometry, and the band-overflow detector
(ops/warp_banded.py) reports the fraction of samples the static band would
silently zero. Results are embedded in the same JSON line.

Usage: python bench.py [--small] [--iters N] [--model adamvs|msrednet]
                       [--warp_impl ...] [--dtype f32|bf16] [--batch N]
                       [--selftest]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# amortize the (remote) TPU compile across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

# Derivation in BASELINE.md ("Throughput baseline derivation"): the modeled
# reference-GPU rate spans 0.1 (V100-class, high eager overhead — the
# conservative anchor, also round 1's constant, keeping the recorded series
# comparable) to 0.65 maps/s (well-utilized RTX 3090 bound). Both are
# reported: vs_baseline uses the anchor, vs_baseline_strict the upper bound.
REF_GPU_DEPTH_MAPS_PER_S = 0.1
REF_GPU_DEPTH_MAPS_PER_S_STRICT = 0.65
# Train-side anchors (384x768 crops): the eager per-slice reference model
# gives ~0.5 steps/s (the lenient anchor); the strict bound mirrors the
# predict derivation — step work ~= 2.5 TFLOP/map x (384*768 / 2752*1856)
# pixels x ~3x fwd+bwd ~= 0.43 TFLOP at 1.6 TF/s effective 3090-class
# throughput -> ~3.7 steps/s (intentionally generous to the reference).
REF_GPU_TRAIN_STEPS_PER_S = 0.5
REF_GPU_TRAIN_STEPS_PER_S_STRICT = 3.7


def make_inputs(height, width, views, batch):
    """Bench scene: plausible aerial predict geometry. proj = K @ T with
    focal-scaled translations (f*baseline): baselines ~10-40m at 300-500m
    depth give 50-300px disparities like real WHU_OMVS flights."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    B, V = batch, views
    imgs = jnp.asarray(rng.randn(B, V, height, width, 3).astype(np.float32))
    proj = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for v in range(V):
        proj[:, v, 0, 0] = 2200.0
        proj[:, v, 1, 1] = 2200.0
        proj[:, v, 0, 2] = width / 2
        proj[:, v, 1, 2] = height / 2
        proj[:, v, 0, 3] = 2200.0 * 10.0 * v  # f * (10m per-view baseline)
    projs = {}
    for k in (1, 2, 3):
        s = 2 ** (3 - k)
        p = proj.copy()
        p[:, :, :2, :] /= s
        projs[f"stage{k}"] = jnp.asarray(p)
    dv = jnp.asarray(np.tile(np.array([[300.0, 500.0]], np.float32), (B, 1)))
    return imgs, projs, dv


def run_bench(height, width, views, numdepth, iters, model_name, warmup=1,
              warp_impl="gather", dtype=None, batch=1, bands=None, remat=True,
              sweep_impl="scan", fuse_d_chunk=16, reg_impl="scan",
              data_parallel=1):
    """``data_parallel=N``: the multi-chip predict work-queue modeled as SPMD —
    N frames sharded one-per-device over a (data,) mesh (frames are
    independent, so this is the per-chip throughput of the predict work queue,
    parallel/distributed predict)."""
    import jax
    import jax.numpy as jnp

    from adamvs_tpu.models import build_model

    if reg_impl != "scan" and sweep_impl not in ("fused", "fusedf32"):
        raise SystemExit(
            f"--reg_impl {reg_impl} requires --sweep_impl fused/fusedf32 "
            "(the fused regularizers consume the fused sweep's volume); "
            "refusing to silently run the scan regularizer (ADVICE r3)"
        )
    valid_reg = {"adamvs": ("scan", "pallas", "precomp"),
                 "msrednet": ("scan", "precomp")}
    if reg_impl not in valid_reg[model_name]:
        raise SystemExit(
            f"--reg_impl {reg_impl} is not valid for --model {model_name} "
            f"(choices: {valid_reg[model_name]})"
        )
    kw = {"warp_impl": warp_impl, "use_remat": remat,
          "sweep_impl": sweep_impl, "fuse_d_chunk": fuse_d_chunk,
          "reg_impl": reg_impl}
    if bands is not None:
        kw["warp_bands"] = tuple(bands)
    if dtype == "bf16":
        kw["dtype"] = jnp.bfloat16
    model = build_model(model_name, **kw)
    imgs, projs, dv = make_inputs(height, width, views, batch * data_parallel)
    B = batch * data_parallel

    # conv params are spatial-size-independent: init cheaply at a small size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, views, 64, 96, 3), jnp.float32),
        projs, dv, num_depth=numdepth,
    )

    apply_kw = {}
    if kw.get("reg_impl") != "scan":
        from adamvs_tpu.models.adamvs import model_pack_reg

        apply_kw["packed_reg"] = model_pack_reg(model, variables)

    if data_parallel > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from adamvs_tpu.parallel import make_mesh, replicate

        mesh = make_mesh(data=data_parallel, tile=1)
        variables = replicate(variables, mesh)
        apply_kw = replicate(apply_kw, mesh)
        sb = NamedSharding(mesh, P("data"))
        imgs = jax.device_put(imgs, sb)
        projs = {k: jax.device_put(v, sb) for k, v in projs.items()}
        dv = jax.device_put(dv, sb)

    @jax.jit
    def fwd(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False,
                          num_depth=numdepth, **apply_kw)
        return out["depth"], out["photometric_confidence"]

    def sync(x):
        # block_until_ready alone does not flush execution through the axon
        # relay; fetching a device-reduced scalar guarantees completion
        return float(jnp.sum(x))

    # XLA-counted flops/bytes for the roofline columns (counts the math as
    # written, incl. the one-hot hat matmuls of the banded/pallas warps).
    # Execute the AOT-compiled object directly: ``.lower().compile()`` does
    # NOT populate the jit dispatch cache, so calling ``fwd(...)`` afterwards
    # would compile the whole module a SECOND time — at the Pallas
    # regularizer config that is ~15 extra minutes (the axon backend never
    # engages the persistent compilation cache).
    flops = bytes_accessed = None
    call = fwd
    try:
        compiled = fwd.lower(variables, imgs, projs, dv).compile()
        call = compiled
        cost = compiled.cost_analysis()
        if cost:
            flops = float(cost.get("flops", 0.0)) or None
            bytes_accessed = float(cost.get("bytes accessed", 0.0)) or None
    except Exception:
        pass

    for _ in range(warmup):
        d, p = call(variables, imgs, projs, dv)
        sync(d)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        d, p = call(variables, imgs, projs, dv)
        sync(d)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), flops, bytes_accessed


def make_train_batch(height, width, views, batch):
    """Training batch at reference-like crop shapes with GT pyramid + masks."""
    import jax.numpy as jnp

    imgs, projs, dv = make_inputs(height, width, views, batch)
    rng = np.random.RandomState(3)
    B = batch
    dv3 = jnp.concatenate(
        [dv, jnp.full((B, 1), (500.0 - 300.0) / 192, jnp.float32)], axis=1
    )  # [min, max, interval]
    gt = jnp.asarray(rng.uniform(320, 480, (B, height, width)).astype(np.float32))
    batch_d = {
        "imgs": imgs,
        "proj_matrices": projs,
        "depth_values": dv3,
        "depth": {"stage1": gt[:, ::4, ::4], "stage2": gt[:, ::2, ::2], "stage3": gt},
        "mask": {"stage1": jnp.ones((B, height // 4, width // 4)),
                 "stage2": jnp.ones((B, height // 2, width // 2)),
                 "stage3": jnp.ones((B, height, width))},
        "depth_interval": jnp.full((B,), (500.0 - 300.0) / 192, jnp.float32),
    }
    return batch_d


def run_train_bench(height, width, views, iters, model_name, warmup=2,
                    warp_impl="gather", dtype=None, batch=1, remat=True,
                    sweep_impl="scan", fuse_d_chunk=16, data_parallel=1):
    """Steps/s of the FULL jitted train step (fwd + loss + bwd + RMSprop
    update) — the training half of the runtime surface
    (train_whu.py:265-300). With sweep_impl fused*, the forward runs the
    Pallas sweep kernels and the backward the gather-recompute custom VJPs
    (ops/sweep_fuse.py *_t).

    ``data_parallel=N`` runs the step on an N-device (data,) mesh with the
    GLOBAL batch = N x ``batch`` sharded over it (the scaling-efficiency
    harness: same code path as cli.cmd_train --data_parallel). On this image
    only the virtual CPU mesh has multiple devices (wiring proof); on a real
    multi-chip TPU the identical invocation measures true ICI scaling."""
    import jax
    import jax.numpy as jnp

    from adamvs_tpu.models import build_model, model_loss
    from adamvs_tpu.train import create_train_state, make_optimizer, make_train_step

    kw = {"warp_impl": warp_impl, "use_remat": remat,
          "sweep_impl": sweep_impl, "fuse_d_chunk": fuse_d_chunk}
    if dtype == "bf16":
        kw["dtype"] = jnp.bfloat16
    model = build_model(model_name, **kw)
    batch_d = make_train_batch(height, width, views, batch * data_parallel)

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((batch * data_parallel, views, 64, 96, 3), jnp.float32),
        batch_d["proj_matrices"], batch_d["depth_values"],
    )
    state = create_train_state(model, variables, make_optimizer(lr=1e-3))
    if data_parallel > 1:
        from adamvs_tpu.parallel import make_mesh, replicate, shard_batch

        mesh = make_mesh(data=data_parallel, tile=1)
        state = replicate(state, mesh)
        batch_d = shard_batch(batch_d, mesh)
    step = make_train_step(model_loss(model_name), (0.5, 1.0, 2.0))

    # AOT-execute to avoid a second full compile (see run_bench)
    flops = nbytes = None
    call = step
    try:
        compiled = step.lower(state, batch_d).compile()
        call = compiled
        cost = compiled.cost_analysis()
        if cost:
            flops = float(cost.get("flops", 0.0)) or None
            nbytes = float(cost.get("bytes accessed", 0.0)) or None
    except Exception:
        pass

    for _ in range(warmup):
        state, metrics, _ = call(state, batch_d)
        float(metrics["loss"])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, metrics, _ = call(state, batch_d)
        float(metrics["loss"])  # device sync through the scalar fetch
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), flops, nbytes


def run_selftest(height, width, views, bands=None):
    """On-device warp parity: every impl vs the exact gather warp, one mid-
    sweep slice per cascade stage at true stage shapes + bench geometry, plus
    band-overflow diagnostics. Returns a JSON-embeddable dict."""
    import jax
    import jax.numpy as jnp

    from adamvs_tpu.models.adamvs import get_warp_fn
    from adamvs_tpu.ops.warp import _source_coords, warp_transform
    from adamvs_tpu.ops.warp_banded import band_overflow

    _, projs, _ = make_inputs(height, width, views, 1)
    rng = np.random.RandomState(7)
    out: dict[str, float] = {}
    kw = {"bands": tuple(bands)} if bands else {}
    gather = get_warp_fn("gather")
    for si, (s, C) in enumerate([(4, 32), (2, 16), (1, 8)]):
        h, w = height // s, width // s
        feat = jnp.asarray(rng.randn(1, h, w, C).astype(np.float32))
        sp = projs[f"stage{si+1}"][:, 1]
        rp = projs[f"stage{si+1}"][:, 0]
        # per-pixel hypothesis slice with gradient + noise (stage>=2 windows
        # follow the previous depth map, which is not fronto-parallel)
        base = np.linspace(320.0, 470.0, w, dtype=np.float32)[None, None, None, :]
        depth = jnp.asarray(
            np.broadcast_to(base, (1, 1, h, w))
            + rng.randn(1, 1, h, w).astype(np.float32) * 2.0
        )
        ref = gather(feat, sp, rp, depth)
        denom = float(jnp.std(ref)) + 1e-9
        for impl in ("banded", "pallas", "pallas2", "pallas2bf16"):
            try:
                got = get_warp_fn(impl, **kw)(feat, sp, rp, depth) if kw else \
                    get_warp_fn(impl)(feat, sp, rp, depth)
                diff = jnp.abs(got - ref)
                out[f"stage{si+1}_{impl}_rel_maxerr"] = round(float(jnp.max(diff)) / denom, 6)
                out[f"stage{si+1}_{impl}_rel_meanerr"] = round(float(jnp.mean(diff)) / denom, 8)
            except Exception as e:  # noqa: BLE001
                out[f"stage{si+1}_{impl}_rel_maxerr"] = f"FAILED:{type(e).__name__}"
        rot, trans = warp_transform(sp, rp)
        u, v = _source_coords(rot, trans, depth, h, w)
        diag = band_overflow(u, v, h, w)
        out[f"stage{si+1}_band_overflow_frac"] = round(float(diag["overflow_frac"]), 8)

    # fused sweep kernels (ops/sweep_fuse.py) vs the exact gather composition,
    # on device, at a bench-geometry window (full-res gather is too slow)
    from adamvs_tpu.ops.sweep_fuse import (
        corr_sweep_volume, fused_sweep_volume, merge_sources, var_sweep_volume,
    )

    rng = np.random.RandomState(11)
    for si, (s, C, D) in enumerate([(4, 32, 48), (2, 16, 32), (1, 8, 8)]):
        hw, ww = 256, 256
        Vs = views - 1
        ref = jnp.asarray(rng.randn(1, hw, ww, C).astype(np.float32))
        srcs_np = rng.randn(Vs, 1, hw, ww, C).astype(np.float32)
        src_f = jnp.asarray(srcs_np)
        sp = jnp.asarray(np.stack([np.asarray(projs[f"stage{si+1}"][0, v + 1])
                                   for v in range(Vs)])[:, None])
        rp = projs[f"stage{si+1}"][:, 0]
        wts = jnp.asarray(rng.rand(1, hw, ww, Vs).astype(np.float32))
        base = np.linspace(320.0, 470.0, ww, dtype=np.float32)[None, None, :]
        prev = np.broadcast_to(base, (1, hw, ww)) + rng.randn(1, hw, ww) * 2.0
        itv = (500.0 - 300.0) / 192 * (4, 2, 1)[si]
        lo = jnp.asarray((prev - D / 2 * itv).astype(np.float32))
        step = jnp.full((1, hw, ww), itv, jnp.float32)
        srcs_m = merge_sources(src_f, row_band=12, col_band=128,
                               mm_dtype=jnp.bfloat16)
        gather = get_warp_fn("gather")
        d_all = lo[:, None] + np.arange(D, dtype=np.float32)[None, :, None, None] * step[:, None]
        wn = wts / (1e-5 + jnp.sum(wts, axis=-1, keepdims=True))
        want = 0.0
        s_sum = ref[:, None]
        q_sum = (ref * ref)[:, None]
        for v in range(Vs):
            warped = gather(src_f[v], sp[v], rp, d_all)  # [B,D,h,w,C]
            want = want + jnp.moveaxis(
                wn[..., v:v+1][:, None] * (ref[:, None] * warped), 1, 0)
            s_sum = s_sum + warped
            q_sum = q_sum + warped * warped
        got = fused_sweep_volume(ref, srcs_m, sp, rp, wts, lo, step, num_depth=D)
        den = float(jnp.std(want)) + 1e-9
        out[f"stage{si+1}_fusedvol_rel_maxerr"] = round(
            float(jnp.max(jnp.abs(got - want))) / den, 6)
        nv = Vs + 1
        want_v = jnp.moveaxis(q_sum / nv - (s_sum / nv) ** 2, 1, 0)
        got_v = var_sweep_volume(ref, srcs_m, sp, rp, lo, step, num_depth=D)
        den_v = float(jnp.std(want_v)) + 1e-9
        out[f"stage{si+1}_varvol_rel_maxerr"] = round(
            float(jnp.max(jnp.abs(got_v - want_v))) / den_v, 6)
        if si == 0:
            want_c = jnp.stack([
                jnp.moveaxis(jnp.mean(
                    ref[:, None] * gather(src_f[v], sp[v], rp, d_all), -1), 1, -1)
                for v in range(Vs)
            ])  # [Vs,B,h,w,D]
            got_c = corr_sweep_volume(ref, srcs_m, sp, rp, lo, step, num_depth=D)
            den_c = float(jnp.std(want_c)) + 1e-9
            out["stage1_corrvol_rel_maxerr"] = round(
                float(jnp.max(jnp.abs(got_c - want_c))) / den_c, 6)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="predict", choices=["predict", "train"],
                    help="train: steps/s of the jitted train step at "
                         "reference crop shapes (fwd+bwd+update)")
    ap.add_argument("--small", action="store_true", help="reduced-size smoke config")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--model", default="adamvs")
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--numdepth", type=int, default=192)
    ap.add_argument("--warp_impl", default="pallas2bf16",
                    choices=["gather", "banded", "pallas", "pallas2", "pallas2bf16"])
    ap.add_argument("--sweep_impl", default="fused",
                    choices=["scan", "fused", "fusedf32"],
                    help="fused: one Pallas plane-sweep call per stage "
                         "instead of per-depth warps in-scan")
    ap.add_argument("--fuse_d_chunk", type=int, default=16)
    ap.add_argument("--reg_impl", default=None,
                    choices=["scan", "pallas", "precomp"],
                    help="pallas (adamvs): whole recurrent-regularizer depth "
                         "scan in one Pallas kernel per stage; precomp "
                         "(msrednet): input-side convs batched over D outside "
                         "the scan. Both need a fused sweep. Default: pallas "
                         "for adamvs predict (the measured config since r5, "
                         "0.56 maps/s vs 0.47 scan), scan otherwise")
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--batch", type=int, default=1,
                    help="frames per step; amortizes the serial depth recurrence")
    ap.add_argument("--bands", default=None,
                    help="row_band,col_band for banded/pallas warps (e.g. 16,128)")
    ap.add_argument("--selftest", action="store_true",
                    help="verify warp numerics on device and embed the report")
    ap.add_argument("--remat", default="on", choices=["on", "off"],
                    help="nn.remat around the sweep cells (identity math at "
                         "eval; measures the flax-scan overhead it induces)")
    ap.add_argument("--data_parallel", type=int, default=1,
                    help="N-device scaling-efficiency harness: run the step "
                         "on a (data=N,) mesh with the global batch sharded "
                         "over it AND on 1 device, and report steps/s-per-"
                         "chip efficiency. Needs N devices (use "
                         "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_"
                         "platform_device_count=N for the wiring proof; on "
                         "real multi-chip hardware it measures ICI scaling)")
    args = ap.parse_args()

    if args.reg_impl is None:
        # measured default (BASELINE.md round-5 series): the Pallas
        # regularizer scan is inference-only and AdaMVS-only
        args.reg_impl = (
            "pallas" if args.model == "adamvs" and args.mode == "predict"
            else "scan")

    if args.small:
        h, w, nd = 704, 480, 96
    else:
        h, w, nd = 2752, 1856, args.numdepth
    if args.height:
        h = args.height
    if args.width:
        w = args.width
    bands = [int(x) for x in args.bands.split(",")] if args.bands else None

    if args.mode == "train":
        # reference-like training crop (full-res oblique patches);
        # --height/--width override (e.g. tiny shapes for the CPU-mesh
        # scaling-harness wiring proof)
        th_, tw_ = (384, 768) if not args.small else (192, 384)
        if args.height:
            th_ = args.height
        if args.width:
            tw_ = args.width
        bench_kw = dict(
            warp_impl=args.warp_impl, dtype=args.dtype, batch=args.batch,
            remat=args.remat == "on", sweep_impl=args.sweep_impl,
            fuse_d_chunk=args.fuse_d_chunk,
        )
        sec, flops, nbytes = run_train_bench(
            th_, tw_, 5, args.iters, args.model,
            data_parallel=args.data_parallel, **bench_kw,
        )
        steps_per_s = args.batch * args.data_parallel / sec
        result = {
            "metric": f"{args.model}_train_{th_}x{tw_}_steps_per_s_per_chip",
            "value": round(steps_per_s / args.data_parallel, 5),
            "unit": "train_steps/s/chip",
            # modeled reference anchors (BASELINE.md "Training throughput
            # anchor"): eager per-slice GPU loop, fwd+bwd ~3x fwd flops at
            # 1/17 the bench-map pixels -> ~0.5 steps/s; strict = 3090-class
            # well-utilized bound (~3.7 steps/s)
            "vs_baseline": round(
                steps_per_s / args.data_parallel / REF_GPU_TRAIN_STEPS_PER_S, 3),
            "vs_baseline_strict": round(
                steps_per_s / args.data_parallel / REF_GPU_TRAIN_STEPS_PER_S_STRICT,
                3),
            "config": {
                "warp_impl": args.warp_impl, "sweep_impl": args.sweep_impl,
                "dtype": args.dtype, "batch": args.batch, "remat": args.remat,
            },
        }
        if args.data_parallel > 1:
            sec1, _, _ = run_train_bench(
                th_, tw_, 5, args.iters, args.model, **bench_kw)
            result["config"]["data_parallel"] = args.data_parallel
            result["scaling"] = {
                "n_devices": args.data_parallel,
                "global_steps_per_s": round(args.batch * args.data_parallel / sec, 5),
                "one_device_steps_per_s": round(args.batch / sec1, 5),
                # per-chip throughput retained vs the 1-chip run
                "efficiency": round(sec1 / sec, 4),
            }
        if flops:
            result["tflops_per_s"] = round(flops / sec / 1e12, 3)
        if nbytes:
            result["hbm_gbps"] = round(nbytes / sec / 1e9, 2)
        print(json.dumps(result))
        return result

    bench_kw = dict(
        warp_impl=args.warp_impl, dtype=args.dtype, batch=args.batch, bands=bands,
        remat=args.remat == "on", sweep_impl=args.sweep_impl,
        fuse_d_chunk=args.fuse_d_chunk, reg_impl=args.reg_impl,
    )
    sec_per_batch, flops, nbytes = run_bench(
        h, w, 5, nd, args.iters, args.model,
        data_parallel=args.data_parallel, **bench_kw,
    )
    maps_per_s = args.batch * args.data_parallel / sec_per_batch
    result = {
        "metric": f"{args.model}_predict_{h}x{w}_d{nd}_depth_maps_per_s_per_chip",
        "value": round(maps_per_s / args.data_parallel, 5),
        "unit": "depth_maps/s/chip",
        "vs_baseline": round(maps_per_s / args.data_parallel / REF_GPU_DEPTH_MAPS_PER_S, 3),
        "vs_baseline_strict": round(
            maps_per_s / args.data_parallel / REF_GPU_DEPTH_MAPS_PER_S_STRICT, 3),
        "config": {
            "warp_impl": args.warp_impl, "sweep_impl": args.sweep_impl,
            "reg_impl": args.reg_impl, "dtype": args.dtype,
            "batch": args.batch, "remat": args.remat,
        },
    }
    if args.data_parallel > 1:
        sec1, _, _ = run_bench(h, w, 5, nd, args.iters, args.model, **bench_kw)
        result["config"]["data_parallel"] = args.data_parallel
        result["scaling"] = {
            "n_devices": args.data_parallel,
            "global_maps_per_s": round(maps_per_s, 5),
            "one_device_maps_per_s": round(args.batch / sec1, 5),
            "efficiency": round(sec1 / sec_per_batch, 4),
        }
    if flops:
        result["tflops_per_s"] = round(flops / sec_per_batch / 1e12, 3)
    if nbytes:
        result["hbm_gbps"] = round(nbytes / sec_per_batch / 1e9, 2)
    if args.selftest:
        result["selftest"] = run_selftest(h, w, 5, bands=bands)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
