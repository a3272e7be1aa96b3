"""Command-line entry points: train / test / predict / profile.

Maps the reference flag surface (train_whu.py:23-62, predict_whu.py:22-51)
onto subcommands with no import-time side effects:

    python -m adamvs_tpu.cli train   --trainpath ... --testpath ... --logdir ...
    python -m adamvs_tpu.cli test    --testpath ... --loadckpt ...
    python -m adamvs_tpu.cli predict --data_folder ... --output_folder ... --loadckpt ...
    python -m adamvs_tpu.cli profile --testpath ...   # jax.profiler trace
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    DataConfig,
    ModelConfig,
    PredictConfig,
    TrainConfig,
    parse_float_list,
    parse_int_list,
    parse_lrepochs,
)


def _maybe_distributed(args):
    if getattr(args, "distributed", False):
        from .parallel import initialize_distributed

        initialize_distributed()


def _add_model_flags(p: argparse.ArgumentParser):
    p.add_argument("--model", default="adamvs", choices=["adamvs", "msrednet"])
    p.add_argument("--ndepths", default="48,32,8")
    p.add_argument("--depth_inter_r", default="4,2,1")
    p.add_argument("--cr_base_chs", default="8,8,8")
    p.add_argument("--share_cr", action="store_true")
    p.add_argument("--warp_impl", default="gather", choices=["gather", "banded", "pallas", "pallas2", "pallas2bf16"])
    p.add_argument("--sweep_impl", default="scan", choices=["scan", "fused", "fusedf32"],
                   help="fused: one-Pallas-call plane sweep per stage (adamvs predict path)")
    p.add_argument("--reg_impl", default="scan",
                   choices=["scan", "pallas", "precomp"],
                   help="pallas (adamvs): whole recurrent-regularizer depth "
                        "scan in one Pallas kernel per stage; precomp "
                        "(msrednet): input-side convs batched over D outside "
                        "the scan. Both inference-only, need --sweep_impl fused")
    p.add_argument("--compute_dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--distributed", action="store_true",
                   help="initialize the multi-host JAX runtime (parallel/distributed.py)")


def _model_config(args) -> ModelConfig:
    return ModelConfig(
        model=args.model,
        ndepths=parse_int_list(args.ndepths),
        depth_intervals_ratio=parse_float_list(args.depth_inter_r),
        cr_base_chs=parse_int_list(args.cr_base_chs),
        share_cr=args.share_cr,
        warp_impl=args.warp_impl,
        sweep_impl=args.sweep_impl,
        reg_impl=getattr(args, "reg_impl", "scan"),
        dtype=args.compute_dtype,
    )


def _init_variables(model, data: DataConfig, sample_shape):
    """Initialize params against a dummy batch of the right static shape."""
    V, H, W = sample_shape
    imgs = jnp.zeros((1, V, H, W, 3), jnp.float32)
    eye = jnp.eye(4)[None, None].repeat(V, 1)
    projs = {f"stage{k}": eye for k in (1, 2, 3)}
    dv = jnp.asarray([[100.0, 200.0, 1.0]], jnp.float32)
    return model.init(jax.random.PRNGKey(0), imgs, projs, dv)


def _first_sample_shape(specs, data: DataConfig):
    from .data.pipeline import load_train_sample

    s = load_train_sample(specs[0], mode="test", interval_scale=data.interval_scale)
    return (s.imgs.shape[0], s.imgs.shape[1], s.imgs.shape[2])


def cmd_train(args):
    _maybe_distributed(args)
    from .data.lists import build_sample_list
    from .data.loader import batch_iterator
    from .models import model_loss
    from .train import Trainer, create_train_state, make_lr_schedule, make_optimizer

    data = DataConfig(
        set_name=args.set_name, trainpath=args.trainpath,
        testpath=args.testpath or args.trainpath,
        view_num=args.view_num, interval_scale=args.interval_scale,
        batch_size=args.batch_size, num_workers=args.num_workers,
    )
    mc = _model_config(args)
    tc = TrainConfig(
        epochs=args.epochs, lr=args.lr, lrepochs=args.lrepochs, wd=args.wd,
        summary_freq=args.summary_freq, save_freq=args.save_freq, seed=args.seed,
        logdir=args.logdir, resume=args.resume, loadckpt=args.loadckpt,
        dlossw=parse_float_list(args.dlossw),
    )

    train_specs = build_sample_list(data.trainpath, data.set_name, data.view_num)
    test_specs = build_sample_list(data.testpath, data.set_name, data.view_num)

    # SPMD data parallelism (the reference's one parallelism, as
    # nn.DataParallel at train_whu.py:110): a (data,) mesh over local or
    # pod-wide devices; each host loads a disjoint shard of the sample list
    # and supplies its slice of the global batch (parallel/mesh.shard_batch).
    mesh = None
    n_hosts, host = jax.process_count(), jax.process_index()
    if n_hosts > 1 and args.data_parallel == 1:
        # without a data-parallel mesh each process would train an
        # independent replica on 1/n of the data with no gradient sync
        raise SystemExit(
            f"{n_hosts} JAX processes require --data_parallel (use 0 for "
            "all devices): multi-host training without a data mesh would "
            "silently train unsynchronized replicas")
    if args.data_parallel != 1:
        from .parallel import make_mesh

        dp = args.data_parallel if args.data_parallel > 0 else None
        mesh = make_mesh(data=dp, tile=1)
        dp = mesh.shape["data"]
        if data.batch_size % dp:
            raise SystemExit(
                f"--batch_size {data.batch_size} must be divisible by the "
                f"data-parallel size {dp}")
        if n_hosts > 1:
            # per-host local batch; sample lists sharded below
            data.batch_size //= n_hosts
    if n_hosts > 1:
        # equal per-host shard lengths (truncate the remainder): hosts run
        # the same number of collective train/eval steps — a host with one
        # extra batch would enter the jitted step alone and hang SPMD
        n_tr, n_te = len(train_specs) // n_hosts, len(test_specs) // n_hosts
        train_specs = train_specs[host::n_hosts][:n_tr]
        test_specs = test_specs[host::n_hosts][:n_te]
    steps_per_epoch = max(1, len(train_specs) // data.batch_size)

    model = mc.build()
    variables = _init_variables(model, data, _first_sample_shape(train_specs, data))
    milestones, gamma = parse_lrepochs(tc.lrepochs)
    sched = make_lr_schedule(tc.lr, list(milestones), gamma, steps_per_epoch)
    tx = make_optimizer(lr=sched, weight_decay=tc.wd)
    state = create_train_state(model, variables, tx)

    trainer = Trainer(
        model, model_loss(mc.model), state, tc.logdir, dlossw=tc.dlossw,
        num_stages=len(mc.ndepths), summary_freq=tc.summary_freq, save_freq=tc.save_freq,
        mesh=mesh,
    )
    start_epoch = 0
    if tc.resume:
        start_epoch = trainer.resume()
    elif tc.loadckpt:
        trainer.load(tc.loadckpt)

    for epoch in range(start_epoch, tc.epochs):
        train_batches = batch_iterator(
            train_specs, data.batch_size, "train", shuffle=True, seed=tc.seed,
            num_workers=data.num_workers, interval_scale=data.interval_scale, epoch=epoch,
        )
        trainer.train_epoch(epoch, train_batches)
        val_batches = batch_iterator(
            test_specs, data.batch_size, "test", shuffle=False, seed=tc.seed,
            num_workers=data.num_workers, interval_scale=data.interval_scale,
            drop_last=False,
        )
        val = trainer.eval_epoch(epoch, val_batches)
        print(f"epoch {epoch} val: {val}")
        trainer.end_epoch(epoch, val)


def cmd_test(args):
    _maybe_distributed(args)
    """Evaluate on the test split and export depth/prob/color outputs
    (reference test(), train_whu.py:213-262)."""
    from .data.lists import build_sample_list
    from .data.loader import batch_iterator
    from .models import model_loss
    from .predict.engine import colorize_depth, colorize_prob
    from .io.pfm import write_pfm
    from .train import (
        Trainer, create_train_state, make_eval_step, make_optimizer,
        latest_checkpoint, restore_checkpoint,
    )
    from .train.loop import AverageMeter
    from .data.pipeline import load_train_sample, batch_train_samples
    from PIL import Image

    data = DataConfig(
        set_name=args.set_name, testpath=args.testpath, view_num=args.view_num,
        interval_scale=args.interval_scale, batch_size=args.batch_size,
    )
    mc = _model_config(args)
    specs = build_sample_list(data.testpath, data.set_name, data.view_num)
    model = mc.build()
    variables = _init_variables(model, data, _first_sample_shape(specs, data))
    state = create_train_state(model, variables, make_optimizer())
    ckpt = args.loadckpt or latest_checkpoint(args.logdir)
    if ckpt:
        state = restore_checkpoint(ckpt, state)
        print(f"loaded {ckpt}")

    estep = make_eval_step(
        model_loss(mc.model), parse_float_list(args.dlossw), len(mc.ndepths),
        model=model,
    )
    out_root = os.path.join(data.testpath, f"depths_{data.set_name}")
    meter = AverageMeter()
    bs = max(1, data.batch_size)
    for i0 in range(0, len(specs), bs):
        group = specs[i0 : i0 + bs]
        samples = [
            load_train_sample(sp, mode="test", interval_scale=data.interval_scale)
            for sp in group
        ]
        batch = batch_train_samples(samples)
        t0 = time.time()
        metrics, depth, prob = estep(state, batch)
        scalars = {k: float(v) for k, v in metrics.items()}
        meter.update(scalars)
        print(
            f"Iter {i0}/{len(specs)} (batch {len(group)}), "
            f"time={time.time() - t0:.3f}s, {scalars}"
        )

        for j, s in enumerate(samples):
            folder = os.path.join(out_root, s.vid)
            os.makedirs(os.path.join(folder, "color"), exist_ok=True)
            d = np.float32(np.asarray(depth)[j])
            p = np.float32(np.asarray(prob)[j])
            write_pfm(os.path.join(folder, f"{s.name}_init.pfm"), d)
            write_pfm(os.path.join(folder, f"{s.name}_prob.pfm"), p)
            Image.fromarray(s.out_image).save(os.path.join(folder, f"{s.name}.jpg"))
            Image.fromarray(colorize_depth(d)).save(
                os.path.join(folder, "color", f"{s.name}_init.png"))
            Image.fromarray(colorize_prob(p)).save(
                os.path.join(folder, "color", f"{s.name}_prob.png"))
    print("final:", meter.mean())


def cmd_predict(args):
    _maybe_distributed(args)
    from .data.lists import build_predict_list
    from .predict import PredictEngine
    from .train import create_train_state, make_optimizer, restore_checkpoint

    pc = PredictConfig(
        data_folder=args.data_folder, output_folder=args.output_folder,
        loadckpt=args.loadckpt, view_num=args.view_num, numdepth=args.numdepth,
        max_w=args.max_w, max_h=args.max_h, resize_scale=args.resize_scale,
        sample_scale=args.sample_scale, display=args.display,
    )
    mc = _model_config(args)
    source = build_predict_list(pc.data_folder, pc.view_num)

    model = mc.build()
    # init against the first sample's shape
    from .data.pipeline import load_predict_sample

    first = load_predict_sample(
        source, source.work_items[0], num_depth=pc.numdepth,
        resize_scale=pc.resize_scale, max_h=pc.max_h, max_w=pc.max_w,
        sample_scale=pc.sample_scale,
    )
    V, H, W = first.imgs.shape[:3]
    H32, W32 = H + (-H) % 32, W + (-W) % 32
    imgs = jnp.zeros((1, V, H32, W32, 3), jnp.float32)
    eye = jnp.eye(4)[None, None].repeat(V, 1)
    projs = {f"stage{k}": eye for k in (1, 2, 3)}
    dv = jnp.asarray([[100.0, 200.0]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv, num_depth=pc.numdepth)

    if pc.loadckpt:
        state = create_train_state(model, variables, make_optimizer())
        state = restore_checkpoint(pc.loadckpt, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    tile_mesh = None
    if args.tiles > 1:
        from .parallel import make_mesh

        tile_mesh = make_mesh(data=1, tile=args.tiles)
    engine = PredictEngine(
        model, variables, num_depth=pc.numdepth, tile_mesh=tile_mesh,
        feature_cache=args.feature_cache,
    )
    engine.run(
        source, pc.output_folder, display=pc.display,
        load_kwargs=dict(
            resize_scale=pc.resize_scale, max_h=pc.max_h, max_w=pc.max_w,
            sample_scale=pc.sample_scale,
        ),
        batch_size=args.predict_batch,
    )


def cmd_profile(args):
    _maybe_distributed(args)
    """Warmup + profiled eval iterations with a Perfetto/TensorBoard trace
    (reference profile(), train_whu.py:345-373)."""
    from .data.lists import build_sample_list
    from .data.loader import batch_iterator
    from .models import model_loss
    from .train import create_train_state, make_eval_step, make_optimizer

    data = DataConfig(
        set_name=args.set_name, testpath=args.testpath, view_num=args.view_num,
        interval_scale=args.interval_scale, batch_size=args.batch_size,
    )
    mc = _model_config(args)
    specs = build_sample_list(data.testpath, data.set_name, data.view_num)
    model = mc.build()
    variables = _init_variables(model, data, _first_sample_shape(specs, data))
    state = create_train_state(model, variables, make_optimizer())
    estep = make_eval_step(
        model_loss(mc.model), parse_float_list(args.dlossw), len(mc.ndepths),
        model=model,
    )

    batches = batch_iterator(
        specs, data.batch_size, "test", shuffle=False, drop_last=False, num_workers=2
    )
    batches = list(batches)
    for i in range(min(args.warmup, len(batches))):
        t0 = time.time()
        metrics, depth, _ = estep(state, batches[i % len(batches)])
        depth.block_until_ready()
        print(f"warmup {i}: {time.time() - t0:.4f}s")

    trace_dir = args.trace_dir
    with jax.profiler.trace(trace_dir):
        for i in range(args.iters):
            t0 = time.time()
            metrics, depth, _ = estep(state, batches[i % len(batches)])
            depth.block_until_ready()
            print(f"profile {i}: {time.time() - t0:.4f}s")
    print(f"trace written to {trace_dir} (open with TensorBoard or Perfetto)")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="adamvs_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train")
    _add_model_flags(pt)
    pt.add_argument("--set_name", default="whu_omvs")
    pt.add_argument("--dataset", default="cas_total_rscv")
    pt.add_argument("--trainpath", required=True)
    pt.add_argument("--testpath", default="")
    pt.add_argument("--logdir", default="./checkpoints/run")
    pt.add_argument("--loadckpt", default="")
    pt.add_argument("--resume", action="store_true")
    pt.add_argument("--view_num", type=int, default=5)
    pt.add_argument("--interval_scale", type=float, default=1.0)
    pt.add_argument("--min_interval", type=float, default=0.1)
    pt.add_argument("--dlossw", default="0.5,1.0,2.0")
    pt.add_argument("--epochs", type=int, default=80)
    pt.add_argument("--lr", type=float, default=1e-3)
    pt.add_argument("--lrepochs", default="10,12,14:2")
    pt.add_argument("--wd", type=float, default=0.0)
    pt.add_argument("--summary_freq", type=int, default=50)
    pt.add_argument("--save_freq", type=int, default=1)
    pt.add_argument("--seed", type=int, default=1)
    pt.add_argument("--batch_size", type=int, default=1)
    pt.add_argument("--num_workers", type=int, default=2)
    pt.add_argument("--data_parallel", type=int, default=1,
                    help="shard the (global) batch over this many devices "
                         "(0 = all devices); SPMD analog of nn.DataParallel")
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("test")
    _add_model_flags(pe)
    pe.add_argument("--set_name", default="whu_omvs")
    pe.add_argument("--dataset", default="cas_total_rscv")
    pe.add_argument("--testpath", required=True)
    pe.add_argument("--logdir", default="./checkpoints/run")
    pe.add_argument("--loadckpt", default="")
    pe.add_argument("--view_num", type=int, default=5)
    pe.add_argument("--interval_scale", type=float, default=1.0)
    pe.add_argument("--dlossw", default="0.5,1.0,2.0")
    pe.add_argument("--batch_size", type=int, default=1)
    pe.set_defaults(fn=cmd_test)

    pp = sub.add_parser("predict")
    _add_model_flags(pp)
    pp.add_argument("--data_folder", required=True)
    pp.add_argument("--output_folder", required=True)
    pp.add_argument("--loadckpt", default="")
    pp.add_argument("--view_num", type=int, default=5)
    pp.add_argument("--numdepth", type=int, default=192)
    pp.add_argument("--max_w", type=int, default=3712)
    pp.add_argument("--max_h", type=int, default=5504)
    pp.add_argument("--min_interval", type=float, default=0.1)
    pp.add_argument("--resize_scale", type=float, default=0.5)
    pp.add_argument("--sample_scale", type=float, default=1.0)
    pp.add_argument("--interval_scale", type=float, default=1.0)
    pp.add_argument("--display", type=lambda s: s.lower() != "false", default=True)
    pp.add_argument("--feature_cache", type=int, default=0,
                    help="LRU size (in source images) of the on-device feature "
                         "cache; each aerial image is a source view in several "
                         "work items, so caching removes redundant feature "
                         "passes. 0 = off.")
    pp.add_argument("--predict_batch", type=int, default=1,
                    help="frames per device step (amortizes the serial depth recurrence)")
    pp.add_argument("--tiles", type=int, default=1,
                    help="shard each frame's rows over this many devices (tile mesh)")
    pp.set_defaults(fn=cmd_predict)

    pf = sub.add_parser("profile")
    _add_model_flags(pf)
    pf.add_argument("--set_name", default="whu_omvs")
    pf.add_argument("--testpath", required=True)
    pf.add_argument("--view_num", type=int, default=5)
    pf.add_argument("--interval_scale", type=float, default=1.0)
    pf.add_argument("--dlossw", default="0.5,1.0,2.0")
    pf.add_argument("--batch_size", type=int, default=1)
    pf.add_argument("--warmup", type=int, default=5)
    pf.add_argument("--iters", type=int, default=5)
    pf.add_argument("--trace_dir", default="./profile_trace")
    pf.set_defaults(fn=cmd_profile)

    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
