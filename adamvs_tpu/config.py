"""Typed configuration dataclasses + the reference CLI flag surface.

Replaces the reference's argparse-with-import-time-side-effects pattern
(train_whu.py:23-62, predict_whu.py:22-51) with plain dataclasses parsed by
``cli.py``; comma-string encodings (``"48,32,8"``, ``"10,12,14:2"``) are kept
for flag-level compatibility.
"""

from __future__ import annotations

import dataclasses


def parse_int_list(s: str) -> tuple[int, ...]:
    return tuple(int(x) for x in s.split(",") if x)


def parse_float_list(s: str) -> tuple[float, ...]:
    return tuple(float(x) for x in s.split(",") if x)


def parse_lrepochs(s: str) -> tuple[tuple[int, ...], float]:
    """``"10,12,14:2"`` -> ((10,12,14), gamma=1/2) (train_whu.py:143-144)."""
    epochs, down = s.split(":")
    return parse_int_list(epochs), 1.0 / float(down)


@dataclasses.dataclass
class ModelConfig:
    model: str = "adamvs"  # adamvs | msrednet
    ndepths: tuple[int, ...] = (48, 32, 8)
    depth_intervals_ratio: tuple[float, ...] = (4.0, 2.0, 1.0)
    cr_base_chs: tuple[int, ...] = (8, 8, 8)
    share_cr: bool = False
    base_channels: int = 8
    warp_impl: str = "gather"  # gather | banded | pallas | pallas2 | pallas2bf16
    # scan: per-depth warp inside the recurrent scan; fused/fusedf32: one
    # Pallas plane-sweep call per stage (adamvs only; ops/sweep_fuse.py)
    sweep_impl: str = "scan"
    # scan: recurrent regularizer as an XLA scan over depth slices.
    # adamvs 'pallas': the whole depth recurrence in one Pallas kernel per
    # stage (ops/red_scan.py). msrednet 'precomp': input-side convs batched
    # over D outside the scan (models/msrednet.py red_precomp_depth).
    # Both inference-only; require sweep_impl fused.
    reg_impl: str = "scan"
    dtype: str = "f32"  # f32 | bf16

    def build(self, **overrides):
        import jax.numpy as jnp

        from .models import build_model

        kwargs = dict(
            ndepths=self.ndepths,
            depth_intervals_ratio=self.depth_intervals_ratio,
            cr_base=self.cr_base_chs,
            base=self.base_channels,
            warp_impl=self.warp_impl,
        )
        kwargs["sweep_impl"] = self.sweep_impl
        valid_reg = {"adamvs": ("scan", "pallas", "precomp"),
                     "msrednet": ("scan", "precomp")}
        if self.reg_impl not in valid_reg.get(self.model, ("scan",)):
            raise ValueError(
                f"reg_impl={self.reg_impl!r} is not valid for model "
                f"{self.model!r} (choices: {valid_reg.get(self.model)})"
            )
        if self.reg_impl != "scan" and self.sweep_impl not in ("fused", "fusedf32"):
            # the fused regularizers consume the sweep kernel's folded
            # layout; fail at build time, not at the first eval apply
            raise ValueError(
                f"reg_impl={self.reg_impl!r} requires sweep_impl "
                f"'fused'/'fusedf32' (got {self.sweep_impl!r})"
            )
        kwargs["reg_impl"] = self.reg_impl
        if self.dtype == "bf16":
            kwargs["dtype"] = jnp.bfloat16
        if self.model == "msrednet":
            kwargs["share_cr"] = self.share_cr
        kwargs.update(overrides)
        return build_model(self.model, **kwargs)


@dataclasses.dataclass
class DataConfig:
    dataset: str = "cas_total_rscv"  # accepted for parity; loaders keyed by set_name
    set_name: str = "whu_omvs"
    trainpath: str = ""
    testpath: str = ""
    view_num: int = 5
    interval_scale: float = 1.0
    batch_size: int = 1
    num_workers: int = 2


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 80
    lr: float = 1e-3
    lrepochs: str = "10,12,14:2"
    wd: float = 0.0
    summary_freq: int = 50
    save_freq: int = 1
    seed: int = 1
    logdir: str = "./checkpoints/run"
    resume: bool = False
    loadckpt: str = ""
    dlossw: tuple[float, ...] = (0.5, 1.0, 2.0)


@dataclasses.dataclass
class PredictConfig:
    data_folder: str = ""
    output_folder: str = ""
    loadckpt: str = ""
    view_num: int = 5
    numdepth: int = 192
    max_w: int = 3712
    max_h: int = 5504
    min_interval: float = 0.1
    resize_scale: float = 0.5
    sample_scale: float = 1.0
    interval_scale: float = 1.0
    display: bool = True
