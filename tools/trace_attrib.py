"""Attribute full-model device time by cascade phase from a profiler trace.

Runs the bench forward once under ``jax.profiler.trace`` and aggregates
device-op durations by the model's ``jax.named_scope`` annotations
(stage{k}_sweep, stage1_pairmatch_v*, feature) plus kernel-level buckets
(pallas warp, convs, fusion elementwise). This is the ground-truth breakdown
the slope probes approximate.

Usage: python tools/trace_attrib.py [--warp_impl pallas2bf16] [--dtype bf16]
                                    [--small]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warp_impl", default="pallas2bf16")
    ap.add_argument("--sweep_impl", default="scan")
    ap.add_argument("--reg_impl", default="scan")
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--trace_dir", default="/tmp/attrib_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from adamvs_tpu.models import build_model
    from bench import make_inputs

    h, w, nd = (704, 480, 96) if args.small else (2752, 1856, 192)
    kw = {"warp_impl": args.warp_impl, "sweep_impl": args.sweep_impl,
          "reg_impl": args.reg_impl}
    if args.dtype == "bf16":
        kw["dtype"] = jnp.bfloat16
    model = build_model("adamvs", **kw)
    imgs, projs, dv = make_inputs(h, w, 5, 1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 64, 96, 3), jnp.float32),
        projs, dv, num_depth=nd,
    )
    apply_kw = {}
    if args.reg_impl != "scan":
        from adamvs_tpu.models.adamvs import model_pack_reg
        apply_kw["packed_reg"] = model_pack_reg(model, variables)

    @jax.jit
    def fwd(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False, num_depth=nd,
                          **apply_kw)
        return out["depth"], out["photometric_confidence"]

    d, p = fwd(variables, imgs, projs, dv)
    _ = float(jnp.sum(d))
    with jax.profiler.trace(args.trace_dir):
        d, p = fwd(variables, imgs, projs, dv)
        _ = float(jnp.sum(d))

    paths = sorted(glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace found"); return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    events = trace["traceEvents"]
    # the flat XLA Ops track of the TPU device: events carry tf_op (the jax
    # scope path incl. named_scope annotations), hlo_category, and the exact
    # device_duration_ps. NOTE: scan `while` shells have an empty tf_op and
    # their duration double-counts their body ops — reported separately.
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {pid for pid, n in pid_names.items() if "TPU" in n}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}

    buckets = defaultdict(float)
    cats = defaultdict(float)
    ops = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if tids.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        a = e.get("args") or {}
        op = a.get("tf_op", "")
        cat = a.get("hlo_category", "?")
        dur = float(a.get("device_duration_ps", 0)) / 1e12
        if cat == "while":
            buckets["(scan-shell, double-counts body)"] += dur
            continue
        total += dur
        if "pairmatch" in op:
            key = "stage1_pairmatch"
        elif "sweep_fusedvol" in op:
            key = op.split("_sweep")[0].split("/")[-1] + "_fusedvol"
        elif "stage1_sweep" in op:
            key = "stage1_sweep"
        elif "stage2_sweep" in op:
            key = "stage2_sweep"
        elif "stage3_sweep" in op:
            key = "stage3_sweep"
        elif "/feature/" in op:
            key = "feature_net"
        else:
            key = "other"
        buckets[key] += dur
        cats[cat] += dur
        ops[(e.get("name", ""), op, cat)] += dur

    print(f"\ntrace: {paths[-1]}")
    print(f"{'phase':36s} {'time(s)':>9s} {'share':>7s}")
    for k in sorted(buckets, key=lambda k: -buckets[k]):
        print(f"{k:36s} {buckets[k]:9.3f} {buckets[k]/max(total,1e-9)*100:6.1f}%")
    print(f"{'TOTAL leaf device ops':36s} {total:9.3f}")
    print("\nby hlo_category:")
    for k in sorted(cats, key=lambda k: -cats[k])[:10]:
        print(f"{k:36s} {cats[k]:9.3f} {cats[k]/max(total,1e-9)*100:6.1f}%")
    print("\ntop 25 leaf ops (hlo name | scope | category):")
    for (name, op, cat), t in sorted(ops.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t:8.3f}s  {cat:18s} {name[:48]:48s} {op[-70:]}")


if __name__ == "__main__":
    main()
