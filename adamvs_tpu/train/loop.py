"""Jitted train/eval steps and the epoch-level Trainer.

The step functions are pure jitted functions over (state, batch); the Trainer
handles host-side concerns: data order, device feeding (with optional mesh
sharding for data parallelism), logging (jsonl + optional TensorBoard), and
checkpointing — the reference's train()/test() loops (train_whu.py:142-262)
restructured without import-time side effects.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.regression import resize_bilinear
from .checkpoint import latest_checkpoint, next_epoch_after, restore_checkpoint, save_checkpoint
from .metrics import eval_metrics
from .state import TrainState, apply_updates_if_finite


def make_train_step(loss_fn: Callable, dlossw) -> Callable:
    def train_step(state: TrainState, batch):
        def wrapped(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"], batch["proj_matrices"], batch["depth_values"],
                train=True, mutable=["batch_stats"],
            )
            loss, depth_loss = loss_fn(out, batch["depth"], batch["mask"], dlossw)
            return loss, (depth_loss, out["depth"], mutated)

        (loss, (depth_loss, depth_est, mutated)), grads = jax.value_and_grad(
            wrapped, has_aux=True
        )(state.params)
        state = apply_updates_if_finite(state, grads, loss)
        state = state.replace(batch_stats=mutated["batch_stats"])
        metrics = {"loss": loss, "depth_loss": depth_loss}
        return state, metrics, depth_est

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(loss_fn: Callable, dlossw, num_stages: int, model=None) -> Callable:
    """``model``: pass the model when its ``reg_impl`` is a fused regularizer
    ('pallas'/'precomp') — those paths need the packed regularizer tree, which
    is a pure function of the *current* params, so it is re-packed inside the
    jitted step (cheap pytree transforms; XLA folds them into the step)."""
    final = f"stage{num_stages}"
    packs = model is not None and getattr(model, "reg_impl", "scan") != "scan"

    def eval_step(state: TrainState, batch):
        kwargs = {}
        if packs:
            from ..models.adamvs import model_pack_reg

            kwargs["packed_reg"] = model_pack_reg(model, {"params": state.params})
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["imgs"], batch["proj_matrices"], batch["depth_values"], train=False,
            **kwargs,
        )
        loss, depth_loss = loss_fn(out, batch["depth"], batch["mask"], dlossw)
        metrics = {"loss": loss, "depth_loss": depth_loss}
        gt = batch["depth"][final]
        # stage cells with up=True can emit depth above the final stage's GT
        # resolution (e.g. a 2-stage cascade ends at full res vs stage2 GT)
        depth_est = resize_bilinear(out["depth"], gt.shape[-2], gt.shape[-1])
        metrics.update(
            eval_metrics(depth_est, gt, batch["mask"][final], batch["depth_interval"])
        )
        return metrics, out["depth"], out["photometric_confidence"]

    return jax.jit(eval_step)


class AverageMeter:
    """Running mean of scalar dicts (reference DictAverageMeter, utils.py:236-255)."""

    def __init__(self):
        self.data: dict[str, float] = {}
        self.count = 0

    def update(self, scalars: dict[str, Any]):
        self.count += 1
        for k, v in scalars.items():
            self.data[k] = self.data.get(k, 0.0) + float(v)

    def mean(self) -> dict[str, float]:
        return {k: v / max(self.count, 1) for k, v in self.data.items()}


class Trainer:
    def __init__(
        self,
        model,
        loss_fn,
        state: TrainState,
        logdir: str,
        dlossw=(0.5, 1.0, 2.0),
        num_stages: int = 3,
        summary_freq: int = 50,
        save_freq: int = 1,
        ckpt_step_freq: int = 3000,
        log_fn: Callable[[str], None] = print,
        mesh=None,
    ):
        """``mesh``: a Mesh with a 'data' axis — SPMD data-parallel training
        (the TPU-native form of the reference's nn.DataParallel,
        train_whu.py:110). Params/opt state are replicated, every batch's
        leading axis is sharded over 'data', and XLA inserts the gradient
        all-reduce. Host-side writes (jsonl/TB/checkpoints) happen on
        process 0 only; the step math is identical to single-device."""
        self.model = model
        self.state = state
        self.logdir = logdir
        self.summary_freq = summary_freq
        self.save_freq = save_freq
        self.ckpt_step_freq = ckpt_step_freq
        self.log = log_fn
        self.mesh = mesh
        self.is_primary = jax.process_index() == 0
        if mesh is not None:
            from ..parallel.mesh import replicate

            self.state = replicate(self.state, mesh)
        self.train_step = make_train_step(loss_fn, dlossw)
        self.eval_step = make_eval_step(loss_fn, dlossw, num_stages, model=model)
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = (
            open(os.path.join(logdir, "metrics.jsonl"), "a")
            if self.is_primary else None
        )
        # TensorBoard scalars (reference save_scalars, utils.py:117-126);
        # optional — jsonl stays the source of truth
        self._tb = None
        if self.is_primary:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def _shard(self, batch):
        if self.mesh is None:
            return batch
        from ..parallel.mesh import shard_batch

        return shard_batch(batch, self.mesh)

    def resume(self) -> int:
        """Restore the latest checkpoint; returns the next epoch index."""
        path = latest_checkpoint(self.logdir)
        if path is None:
            return 0
        self.log(f"resuming from {path}")
        self.state = restore_checkpoint(path, self.state)
        return next_epoch_after(path)

    def load(self, path: str):
        self.log(f"loading checkpoint {path}")
        self.state = restore_checkpoint(path, self.state)

    def _record(self, kind: str, step: int, scalars: dict[str, float]):
        if self._jsonl is None:
            return
        self._jsonl.write(json.dumps({"kind": kind, "step": step, **scalars}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, val in scalars.items():
                self._tb.add_scalar(f"{kind}/{k}", val, step)

    def _record_images(self, kind: str, step: int, batch, depth_est):
        """Depth/GT/error image summaries (reference save_images,
        utils.py:127-147: per-image min-max normalized grids)."""
        if self._tb is None:
            return
        final = f"stage{len(batch['depth'])}" if isinstance(batch["depth"], dict) else None
        gt = batch["depth"][final] if final else batch["depth"]
        mask = batch["mask"][final] if final else batch["mask"]
        est = np.asarray(depth_est[0], np.float32)
        gtn = np.asarray(gt[0], np.float32)
        mk = np.asarray(mask[0], np.float32)
        if est.shape != gtn.shape:
            est = np.asarray(resize_bilinear(jnp.asarray(est), gtn.shape[0], gtn.shape[1]))

        def norm(img):
            lo, hi = float(img.min()), float(img.max())
            return (img - lo) / max(hi - lo, 1e-6)

        err = np.abs(est - gtn) * mk
        self._tb.add_image(f"{kind}/depth_est", norm(est)[None], step)
        self._tb.add_image(f"{kind}/depth_gt", norm(gtn)[None], step)
        self._tb.add_image(f"{kind}/errormap", norm(err)[None], step)

    def train_epoch(self, epoch: int, batches) -> dict[str, float]:
        meter = AverageMeter()
        for i, batch in enumerate(batches):
            t0 = time.time()
            batch = self._shard(batch)
            self.state, metrics, depth_est = self.train_step(self.state, batch)
            step = int(self.state.step)
            scalars = {k: float(v) for k, v in metrics.items()}
            meter.update(scalars)
            if step % self.summary_freq == 0:
                self._record("train", step, scalars)
                self._record_images("train", step, batch, depth_est)
            self.log(
                f"Epoch {epoch}, iter {i}, loss={scalars['loss']:.4f}, "
                f"time={time.time() - t0:.3f}s"
            )
            # every process calls save: Orbax save of jax.Arrays is a
            # collective (distributed barrier + per-shard writes) — gating on
            # process 0 deadlocks a real multi-host run. Orbax itself writes
            # replicated arrays from the primary only.
            if self.ckpt_step_freq and step % self.ckpt_step_freq == 0:
                save_checkpoint(self.logdir, self.state, epoch, tag=f"step{step}")
        return meter.mean()

    def eval_epoch(self, epoch: int, batches) -> dict[str, float]:
        meter = AverageMeter()
        dp = self.mesh.shape["data"] if self.mesh is not None else 1
        dropped = 0
        for i, batch in enumerate(batches):
            # a final short batch not divisible by the data axis can't be
            # sharded; drop it (logged) rather than skew metrics with padding
            if dp > 1 and batch["imgs"].shape[0] % dp:
                dropped += batch["imgs"].shape[0]
                continue
            metrics, _, _ = self.eval_step(self.state, self._shard(batch))
            meter.update({k: float(v) for k, v in metrics.items()})
        if dropped:
            self.log(
                f"eval: dropped {dropped} sample(s) of a final batch not "
                f"divisible by the data-parallel size {dp}"
            )
        means = meter.mean()
        self._record("val", int(self.state.step), means)
        if self.is_primary:
            with open(os.path.join(self.logdir, "train_record.txt"), "a+") as f:
                f.write(f"{epoch} {means}\n")
        return means

    def end_epoch(self, epoch: int, val_metrics: dict[str, float] | None):
        # all processes participate (collective save; see train_epoch)
        if (epoch + 1) % self.save_freq == 0:
            metric = val_metrics.get("abs_depth_error") if val_metrics else None
            # block=True: epoch boundaries can afford the commit wait, and the
            # final epoch's save must not race interpreter teardown (orbax's
            # async commit thread dies on the shut-down default executor).
            # Mid-epoch step saves (train_epoch) stay async.
            save_checkpoint(self.logdir, self.state, epoch, metric=metric,
                            block=True)
