"""Training through the fused sweep kernels: the custom 'recompute-by-gather'
VJPs (ops/sweep_fuse.py fused/var/corr_sweep_volume_t) must produce gradients
matching the exact in-scan warp path. Kernels run under
force_tpu_interpret_mode on the CPU test mesh."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from adamvs_tpu.models import AdaMVS, MSREDNet, cas_mvs_vis_loss, cas_rednet_loss
from adamvs_tpu.ops.sweep_fuse import (
    _xla_fused_volume,
    fused_sweep_volume_t,
)

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run

KEY = jax.random.PRNGKey(0)


def _scene(B=1, V=3, H=32, W=32):
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))
    proj = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for v in range(V):
        proj[:, v, 0, 0] = proj[:, v, 1, 1] = 40.0
        proj[:, v, 0, 2] = W / 2
        proj[:, v, 1, 2] = H / 2
        proj[:, v, 0, 3] = 40.0 * 0.8 * v
    projs = {}
    for k, s in (("stage1", 4), ("stage2", 2), ("stage3", 1)):
        p = proj.copy()
        p[:, :, :2, :] /= s
        projs[k] = jnp.asarray(p)
    dv = jnp.asarray(np.tile([[300.0, 500.0, 25.0]], (B, 1)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(320, 480, (B, H, W)).astype(np.float32))
    batch = {
        "imgs": imgs, "proj_matrices": projs, "depth_values": dv,
        "depth": {"stage1": gt[:, ::4, ::4], "stage2": gt[:, ::2, ::2], "stage3": gt},
        "mask": {"stage1": jnp.ones((B, H // 4, W // 4)),
                 "stage2": jnp.ones((B, H // 2, W // 2)),
                 "stage3": jnp.ones((B, H, W))},
    }
    return batch


def test_fused_volume_vjp_matches_xla_grad():
    """Unit: d(sum(vol*probe))/d(ref,srcs,weights) through the custom VJP ==
    autodiff of the XLA gather composition (the VJP recomputes exactly that);
    projection/hypothesis cotangents are zero (no-grad warp grids)."""
    rng = np.random.RandomState(1)
    B, Vs, h, w, C, D = 1, 2, 16, 16, 8, 8
    ref = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    srcs = jnp.asarray(rng.randn(Vs, B, h, w, C).astype(np.float32))
    wts = jnp.asarray(rng.rand(B, h, w, Vs).astype(np.float32))
    proj = np.tile(np.eye(4, dtype=np.float32), (Vs, B, 1, 1))
    for v in range(Vs):
        proj[v, :, 0, 0] = proj[v, :, 1, 1] = 10.0
        proj[v, :, 0, 2] = w / 2
        proj[v, :, 1, 2] = h / 2
        proj[v, :, 0, 3] = 10.0 * 0.8 * (v + 1)
    src_projs = jnp.asarray(proj)
    ref_proj = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    ref_proj = ref_proj.at[:, 0, 0].set(10.0).at[:, 1, 1].set(10.0)
    ref_proj = ref_proj.at[:, 0, 2].set(w / 2).at[:, 1, 2].set(h / 2)
    lo = jnp.full((B, h, w), 300.0)
    step = jnp.full((B, h, w), 25.0)
    probe = jnp.asarray(rng.randn(D, B, h, w, C).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        def loss_t(r, s, wt):
            vol = fused_sweep_volume_t(
                r, s, wt, src_projs, ref_proj, lo, step, D, 8, 12, 128,
                jnp.float32, jnp.float32,
            )
            return jnp.sum(vol * probe)

        g_t = jax.grad(loss_t, argnums=(0, 1, 2))(ref, srcs, wts)

    def loss_x(r, s, wt):
        vol = _xla_fused_volume(r, s, wt, src_projs, ref_proj, lo, step, D)
        return jnp.sum(vol * probe)

    g_x = jax.grad(loss_x, argnums=(0, 1, 2))(ref, srcs, wts)
    for a, b, name in zip(g_t, g_x, ("ref", "srcs", "weights")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("model_cls,loss_fn", [
    (AdaMVS, cas_mvs_vis_loss), (MSREDNet, cas_rednet_loss),
])
def test_train_grads_fused_vs_scan(model_cls, loss_fn):
    """Model-level: loss gradients with sweep_impl='fusedf32' (Pallas forward,
    gather-recompute backward) track the exact scan path's gradients."""
    batch = _scene()
    kw = dict(ndepths=(8, 4, 4), depth_intervals_ratio=(4.0, 2.0, 1.0),
              base=4, cr_base=(4, 4, 4))
    m_scan = model_cls(sweep_impl="scan", **kw)
    m_fused = model_cls(sweep_impl="fusedf32", **kw)
    variables = m_scan.init(KEY, batch["imgs"], batch["proj_matrices"],
                            batch["depth_values"])

    def make_loss(model):
        def loss(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch["imgs"], batch["proj_matrices"], batch["depth_values"],
                train=True, mutable=["batch_stats"],
            )
            total, _ = loss_fn(out, batch["depth"], batch["mask"], (0.5, 1.0, 2.0))
            return total

        return loss

    l_s, g_s = jax.value_and_grad(make_loss(m_scan))(variables["params"])
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(make_loss(m_fused))(variables["params"])

    assert abs(float(l_s) - float(l_f)) / max(1.0, abs(float(l_s))) < 5e-3
    flat_s, _ = jax.flatten_util.ravel_pytree(g_s)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_f)
    denom = float(jnp.linalg.norm(flat_s)) + 1e-9
    rel = float(jnp.linalg.norm(flat_f - flat_s)) / denom
    assert rel < 5e-2, f"gradient mismatch: rel L2 {rel:.3e}"
    assert bool(jnp.all(jnp.isfinite(flat_f)))
