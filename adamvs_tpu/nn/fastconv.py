"""Shift-einsum convolution: faster small-channel convs on TPU.

At C<=8 (head/entry convs of this model family) XLA's stock NHWC conv picks a
pathological algorithm (measured 4.4 s for a 1.5 GFLOP 8->8 conv at f32);
expressing the conv as a sum of 9 spatially-shifted ``[Cin,Cout]``
contractions runs it at HBM bandwidth instead (tools/conv_probe3.py,
slope-timed on device). At >=16 channels the stock conv wins and is used.

Padding semantics are TORCH-ALIGNED, not XLA-SAME — this makes reference
checkpoints importable bit-exactly (train/torch_import.py):

- ``conv2d_shift(x, k, s)`` == ``torch.conv2d(stride=s, padding=(k-1)//2)``
  with the kernel in HWIO. For stride 1 and odd k this IS XLA SAME; for
  stride 2 XLA SAME pads asymmetrically (bottom/right only), shifting the
  sampling grid one pixel vs torch's symmetric padding.
- ``conv2d_transpose_shift(x, k, s)`` == ``torch.conv_transpose2d(stride=s,
  padding=(k-1)//2, output_padding=s-1 [odd k])`` with the torch kernel
  spatially FLIPPED and permuted to HWIO (torch's transposed conv convolves;
  this runtime correlates — the import transform absorbs the flip). Output is
  exactly ``s*H x s*W``.

``FastConv`` / ``FastConvTranspose`` have parameter *leaves* identical to
``nn.Conv`` / ``nn.ConvTranspose`` ("kernel" [kh,kw,Cin,Cout], optional
"bias"). NOTE the flax auto-generated module *names* differ ("FastConv_0" vs
"Conv_0"), so whole-model checkpoints saved before a block switched
implementations do NOT restore — switching is free for new models only.
The stock conv path is used whenever ``_use_shift`` says XLA wins (see its
docstring for the measured crossover).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

import os

_DISABLE_SHIFT = os.environ.get("ADAMVS_NO_SHIFT_CONV", "") not in ("", "0")
_SHIFT_MAX = int(os.environ.get("ADAMVS_SHIFT_MAX", "16"))


def _stock_ok() -> bool:
    """``use_stock`` is a TPU-layout/perf preference, vetoed on the XLA:CPU
    backend: stock conv thunks under an 8-virtual-device mesh stall the CPU
    collective rendezvous (the multichip dryrun died with 7-of-8 rendezvous
    timeouts when the feature net switched to stock convs — same failure
    class as the im2col note in ``conv2d_shift``). CPU is only the test /
    dryrun backend; the shift path is numerically equivalent there."""
    return jax.default_backend() != "cpu"


def _use_shift(ci: int, co: int) -> bool:
    """Slope-timed on TPU v5e (tools/conv_probe3.py, 1376x928 spatial): the
    shift-einsum path wins only when one side is <=8 channels and the other
    <=16 (it is HBM-bandwidth-bound there; stock XLA conv picks a pathological
    algorithm at 8->8 f32). From 16->16 upward the stock conv is 1.4-4x faster
    (12.5 TF/s at 48ch, 55-75 TF/s at 128ch). Round 1 measured the opposite
    because per-dispatch wall timings carried a ~50 ms host round-trip.
    A/B probe knobs: ``ADAMVS_NO_SHIFT_CONV=1`` forces the stock path
    everywhere; ``ADAMVS_SHIFT_MAX=N`` changes the max-side threshold."""
    if _DISABLE_SHIFT:
        return False
    return min(ci, co) <= 8 and max(ci, co) <= _SHIFT_MAX


def conv2d_shift(x: jnp.ndarray, k: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Torch-padded conv via kh*kw shifted [Cin,Cout] einsums.

    x [B,H,W,Cin], k [kh,kw,Cin,Cout] -> [B, Ho, Wo, Cout] with symmetric
    padding (k-1)//2 per side (== torch.conv2d(padding=(k-1)//2));
    Ho = (H + 2p - kh)//s + 1 (= ceil(H/s) for odd kh).
    """
    B, H, W, Ci = x.shape
    kh, kw, _, Co = k.shape
    ph0 = ph1 = (kh - 1) // 2
    pw0 = pw1 = (kw - 1) // 2
    Ho = (H + 2 * ph0 - kh) // stride + 1
    Wo = (W + 2 * pw0 - kw) // stride + 1
    # extra right/bottom padding so every (dy, dx) slice below stays in range
    ph1 += kh
    pw1 += kw
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    # NOTE: an im2col variant (concat the kh*kw taps, one K=kh*kw*Ci einsum)
    # measured +1% on TPU but deadlocks XLA:CPU collective thunks on a
    # virtual 8-device mesh (the multichip dryrun path) — keep per-tap form.
    out = None
    for dy in range(kh):
        for dx in range(kw):
            xs = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (B, dy + (Ho - 1) * stride + 1, dx + (Wo - 1) * stride + 1, Ci),
                (1, stride, stride, 1),
            )
            term = jnp.einsum(
                "bhwi,io->bhwo", xs, k[dy, dx], preferred_element_type=jnp.float32
            )
            out = term if out is None else out + term
    return out.astype(x.dtype)


def conv2d_transpose_shift(x: jnp.ndarray, k: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """Stride-s transposed conv with output exactly ``s*H x s*W``, torch grid
    alignment (see module docstring), as a shift-einsum over the kernel's
    stride phases.

    y[s*i + a, s*j + b] = sum over kernel taps (ky, kx) with
    (ky, kx) ≡ (a + pl, b + pl) offsets hitting integer input coords — for
    each tap this is a [Cin,Cout] contraction of a shifted copy of x, so the
    whole op is kh*kw shifted einsums exactly like ``conv2d_shift``, grouped
    by phase and interleaved at the end.
    """
    B, H, W, Ci = x.shape
    kh, kw, _, Co = k.shape

    # transposed conv == correlation with lhs_dilation s and per-side padding
    # (pl, pr); torch(p=(k-1)//2, op) has pl = k-1-p and output s*H forces
    # pl+pr = k+s-2 (pr = pl+op)
    def pad_lo(k):
        return k - 1 - (k - 1) // 2

    pl_h = pad_lo(kh)
    pl_w = pad_lo(kw)
    # input-space footprint per output phase: output row s*i+a reads dilated
    # rows s*i+a+pl-ky for ky in [0,kh) — integer input rows only. The slice
    # starts below range over iy//s for iy in [-pl, s-1-pl+k-1]: pad enough
    # on both sides (literal 2 only covers k <= 2s+pl, e.g. k<=7 at s=2).
    pad = max(
        1,
        -(-pl_h // stride), -(-pl_w // stride),
        (stride - 1 - pl_h + kh - 1) // stride,
        (stride - 1 - pl_w + kw - 1) // stride,
    )
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # B == 1: assemble via stack+reshape (measured fastest at the per-slice
    # scan shapes). B > 1: the 6-D stack's two stride-2 dims force 16x
    # lane-padded layouts (20.9 GB HBM temps at batch=2 bench shapes) — use
    # interior-dilated pad + add instead (same math, 4-D arrays only).
    use_stack = B == 1
    phases = [] if use_stack else None
    y = None
    for a in range(stride):
        row_terms = [] if use_stack else None
        for b in range(stride):
            term = None
            for ky in range(kh):
                # y[s·i+a] += xd[s·i + a - pl + ky]·w[ky]  (unflipped kernel,
                # lhs-dilated conv): integer input row iff (a - pl + ky) % s == 0
                iy = a - pl_h + ky
                if iy % stride:
                    continue
                for kx in range(kw):
                    ix = b - pl_w + kx
                    if ix % stride:
                        continue
                    xs = jax.lax.slice(
                        xp,
                        (0, pad + iy // stride, pad + ix // stride, 0),
                        (B, pad + iy // stride + H, pad + ix // stride + W, Ci),
                    )
                    t = jnp.einsum(
                        "bhwi,io->bhwo", xs, k[ky, kx],
                        preferred_element_type=jnp.float32,
                    )
                    term = t if term is None else term + t
            if use_stack:
                if term is None:
                    term = jnp.zeros((B, H, W, Co), jnp.float32)
                row_terms.append(term)
                continue
            if term is None:
                continue
            padded = jax.lax.pad(
                term, jnp.float32(0.0),
                ((0, 0, 0), (a, stride - 1 - a, stride - 1),
                 (b, stride - 1 - b, stride - 1), (0, 0, 0)),
            )
            y = padded if y is None else y + padded
        if use_stack:
            phases.append(jnp.stack(row_terms, axis=3))  # [B,H,W,s,Co]
    if use_stack:
        y = jnp.stack(phases, axis=2)  # [B,H,s,W,s,Co]
        return y.reshape(B, H * stride, W * stride, Co).astype(x.dtype)
    if y is None:
        y = jnp.zeros((B, H * stride, W * stride, Co), jnp.float32)
    return y.astype(x.dtype)


class FastConvTranspose(nn.Module):
    """nn.ConvTranspose-compatible module via phase-grouped shift-einsum
    (``use_stock=True``: the stock lhs-dilated XLA conv instead — identical
    math, layout-friendlier for large batched inputs)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (2, 2)
    use_bias: bool = True
    dtype: Any = None
    use_stock: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        Ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, Ci, self.features)
        )
        dt = self.dtype or x.dtype
        xc = x.astype(dt)
        kc = kernel.astype(dt)
        if (not (self.use_stock and _stock_ok())
                and _use_shift(Ci, self.features)
                and self.strides[0] == self.strides[1]):
            y = conv2d_transpose_shift(xc, kc, self.strides[0])
        else:
            # same torch-aligned grid as the shift path: correlation with
            # lhs dilation s and padding (k-1-p, k-1-p+op), p=(k-1)//2
            # (no preferred_element_type=f32 — untransposable under grad,
            # see FastConv)
            pads = []
            for kk, s in zip((kh, kw), self.strides):
                pl = kk - 1 - (kk - 1) // 2
                pads.append((pl, kk + s - 2 - pl))
            y = jax.lax.conv_general_dilated(
                xc, kc, (1, 1), tuple(pads), lhs_dilation=self.strides,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(dt)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dt)
        return y


class FastConv(nn.Module):
    """nn.Conv-compatible module computing via shift-einsum when C is small.

    ``use_stock=True`` forces the stock XLA conv regardless of channel count:
    the shift-einsum crossover was slope-timed at the depth-scan cells' shapes
    (tools/conv_probe3.py); at the FEATURE net's full-view shapes the stock
    conv is ~2.2x faster end-to-end (444 -> 202 ms bf16 for the 5-view
    AdaFeatureNet pass at 2752x1856, tools/feature_probe.py, round 5)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Any = None
    use_stock: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        Ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, Ci, self.features)
        )
        dt = self.dtype or x.dtype
        xc = x.astype(dt)
        kc = kernel.astype(dt)
        if (not (self.use_stock and _stock_ok())
                and _use_shift(Ci, self.features)
                and self.strides[0] == self.strides[1]):
            y = conv2d_shift(xc, kc, self.strides[0])
        else:
            pad = (((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2)
            # no preferred_element_type=f32: its transpose rule feeds the f32
            # cotangent back into a bf16 conv (dtype-mismatch error under
            # grad); TPU convs accumulate f32 internally for bf16 operands
            # regardless, and the output rounds to ``dt`` either way
            y = jax.lax.conv_general_dilated(
                xc, kc, self.strides, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(dt)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dt)
        return y
