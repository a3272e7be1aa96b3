"""Training-layer tests: metrics parity, optimizer semantics, train/eval steps,
checkpoint round-trip, NaN-guard, and data-parallel step equivalence."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from adamvs_tpu.models import AdaMVS, cas_mvs_vis_loss
from adamvs_tpu.train import (
    TrainState,
    create_train_state,
    eval_metrics,
    latest_checkpoint,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)
from adamvs_tpu.train.metrics import abs_depth_error, interval_metric, threshold_metric

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# metrics: exact parity with the reference torch implementations
# ---------------------------------------------------------------------------


def _torch_metrics(est, gt, mask, interval):
    """Reference utils.py:286-315, re-evaluated with torch for parity."""
    te, tg, tm = torch.tensor(est), torch.tensor(gt), torch.tensor(mask) > 0.5
    out = {}
    B = te.shape[0]

    def per_image(fn):
        return torch.stack([fn(te[i][tm[i]], tg[i][tm[i]]) for i in range(B)]).mean().item()

    thr = 100.0 * interval
    out["abs"] = per_image(
        lambda e, g: (e - g).abs()[(e - g).abs() < thr].mean()
    )
    out["t1"] = per_image(lambda e, g: ((e - g).abs() < 1.0 * interval).float().mean())
    out["t6"] = per_image(lambda e, g: ((e - g).abs() < 6.0 * interval).float().mean())
    out["i3"] = per_image(lambda e, g: ((e - g).abs() / interval < 3).float().mean())
    return out


def test_metrics_match_torch_reference():
    rng = np.random.RandomState(0)
    B, H, W = 2, 13, 17
    gt = (rng.rand(B, H, W) * 100 + 100).astype(np.float32)
    est = gt + rng.randn(B, H, W).astype(np.float32) * 2
    est[0, 0, 0] += 500  # one outlier beyond 100*interval
    mask = (rng.rand(B, H, W) > 0.2).astype(np.float32)
    interval = 1.5

    ref = _torch_metrics(est, gt, mask, interval)
    m = mask > 0.5
    got_abs = float(abs_depth_error(jnp.asarray(est), jnp.asarray(gt), m, 100.0 * interval))
    got_t1 = float(threshold_metric(jnp.asarray(est), jnp.asarray(gt), m, 1.0 * interval))
    got_t6 = float(threshold_metric(jnp.asarray(est), jnp.asarray(gt), m, 6.0 * interval))
    got_i3 = float(interval_metric(jnp.asarray(est), jnp.asarray(gt), interval, m, 3.0))

    assert got_abs == pytest.approx(ref["abs"], rel=1e-5)
    assert got_t1 == pytest.approx(ref["t1"], rel=1e-6)
    assert got_t6 == pytest.approx(ref["t6"], rel=1e-6)
    assert got_i3 == pytest.approx(ref["i3"], rel=1e-6)


def test_rmsprop_matches_torch():
    """optax chain == torch.optim.RMSprop(lr, alpha=0.9) trajectories."""
    w0 = np.array([1.0, -2.0, 3.0], dtype=np.float32)
    grads = [np.array(g, dtype=np.float32) for g in ([0.1, -0.2, 0.3], [0.5, 0.5, -0.5], [-1.0, 0.2, 0.0])]

    tw = torch.tensor(w0, requires_grad=True)
    topt = torch.optim.RMSprop([tw], lr=0.01, alpha=0.9)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    tx = make_optimizer(lr=0.01, alpha=0.9)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = params + updates[0] if isinstance(updates, tuple) else params + updates
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(), rtol=1e-5)


def test_lr_schedule_multistep():
    sched = make_lr_schedule(1e-3, [10, 12, 14], 0.5, steps_per_epoch=100)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(999)) == pytest.approx(1e-3)
    assert float(sched(1000)) == pytest.approx(5e-4)
    assert float(sched(1200)) == pytest.approx(2.5e-4)
    assert float(sched(1400)) == pytest.approx(1.25e-4)


# ---------------------------------------------------------------------------
# steps
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_setup_vars(synthetic_scene):
    from tests.test_models import scene_batch

    imgs, projs, dv = scene_batch(synthetic_scene)
    model = AdaMVS(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4, cr_base=(4, 4))
    variables = model.init(KEY, imgs, projs, dv)
    gt = synthetic_scene.views[0].depth[None]
    mask = np.ones_like(gt)
    batch = {
        "imgs": imgs,
        "proj_matrices": projs,
        "depth_values": dv,
        "depth": {"stage1": jnp.asarray(gt[:, ::4, ::4]), "stage2": jnp.asarray(gt)},
        "mask": {"stage1": jnp.asarray(mask[:, ::4, ::4]), "stage2": jnp.asarray(mask)},
        "depth_interval": jnp.asarray([synthetic_scene.depth_interval], jnp.float32),
    }
    return model, variables, batch


@pytest.fixture()
def tiny_setup(tiny_setup_vars):
    """Fresh TrainState per test — train_step donates the state's buffers."""
    model, variables, batch = tiny_setup_vars
    variables = jax.tree_util.tree_map(jnp.copy, variables)
    state = create_train_state(model, variables, make_optimizer(lr=1e-3))
    return model, state, batch


def test_train_step_reduces_loss(tiny_setup):
    model, state, batch = tiny_setup
    step = make_train_step(cas_mvs_vis_loss, (0.5, 1.0))
    losses = []
    for _ in range(6):
        state, metrics, depth_est = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 6
    assert int(state.nan_steps) == 0
    # optimizing on a single batch must reduce its loss
    assert losses[-1] < losses[0]


def test_eval_step_metrics(tiny_setup):
    model, state, batch = tiny_setup
    estep = make_eval_step(cas_mvs_vis_loss, (0.5, 1.0), num_stages=2)
    metrics, depth, conf = estep(state, batch)
    for k in ("loss", "abs_depth_error", "thres3interval_error"):
        assert np.isfinite(float(metrics[k])), k
    assert depth.shape == batch["depth"]["stage2"].shape


def test_nan_guard_skips_update(tiny_setup):
    model, state, batch = tiny_setup
    bad = dict(batch)
    bad["depth"] = {k: v * jnp.nan for k, v in batch["depth"].items()}
    step = make_train_step(cas_mvs_vis_loss, (0.5, 1.0))
    # masked_mean guards empty masks, so force NaN through the GT itself
    params_before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state2, metrics, _ = step(state, bad)
    if not np.isfinite(float(metrics["loss"])):
        assert int(state2.nan_steps) == 1
        params_after = jax.tree_util.tree_leaves(state2.params)[0]
        np.testing.assert_array_equal(np.asarray(params_before), np.asarray(params_after))


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    model, state, batch = tiny_setup
    logdir = str(tmp_path / "ckpts")
    os.makedirs(logdir)
    save_checkpoint(logdir, state, epoch=0, metric=0.1234)
    save_checkpoint(logdir, state, epoch=1, metric=0.0999)
    path = latest_checkpoint(logdir)
    assert path.endswith("model_000001_0.0999")
    mangled = state.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0, state.params)
    )
    restored = restore_checkpoint(path, mangled)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params), jax.tree_util.tree_leaves(state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_checkpoint_does_not_skip_epoch(tmp_path, tiny_setup):
    """A mid-epoch step-tagged save must resume at the SAME epoch: the old
    epoch regex matched model_{E}_step{N} and returned E+1, silently skipping
    the untrained remainder of epoch E."""
    from adamvs_tpu.train.checkpoint import next_epoch_after

    model, state, batch = tiny_setup
    logdir = str(tmp_path / "ckpts")
    os.makedirs(logdir)
    save_checkpoint(logdir, state, epoch=3, metric=0.2)  # end of epoch 3
    save_checkpoint(logdir, state, epoch=4, tag="step1234")  # mid-epoch 4
    path = latest_checkpoint(logdir)
    assert path.endswith("model_000004_step1234")
    assert next_epoch_after(path) == 4
    # an end-of-epoch save outranks a step save of the same epoch
    save_checkpoint(logdir, state, epoch=4, metric=0.15)
    path = latest_checkpoint(logdir)
    assert path.endswith("model_000004_0.1500")
    assert next_epoch_after(path) == 5


# ---------------------------------------------------------------------------
# data parallel: sharded step == single-device step
# ---------------------------------------------------------------------------


def test_data_parallel_equivalence(synthetic_scene):
    from tests.test_models import scene_batch
    from adamvs_tpu.parallel import make_mesh, shard_batch

    imgs, projs, dv = scene_batch(synthetic_scene)
    # batch of 2 identical samples
    B = 2
    imgs = jnp.concatenate([imgs] * B)
    projs = {k: jnp.concatenate([v] * B) for k, v in projs.items()}
    dv = jnp.concatenate([dv] * B)
    gt = np.repeat(synthetic_scene.views[0].depth[None], B, axis=0)
    batch = {
        "imgs": imgs,
        "proj_matrices": projs,
        "depth_values": dv,
        "depth": {"stage1": jnp.asarray(gt[:, ::4, ::4]), "stage2": jnp.asarray(gt)},
        "mask": {
            "stage1": jnp.ones((B,) + gt.shape[1:])[:, ::4, ::4],
            "stage2": jnp.ones((B,) + gt.shape[1:]),
        },
        "depth_interval": jnp.full((B,), synthetic_scene.depth_interval, jnp.float32),
    }

    model = AdaMVS(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4, cr_base=(4, 4))
    variables = model.init(KEY, imgs, projs, dv)
    # SGD for the equivalence check: RMSprop divides by sqrt(E[g^2]), so a
    # near-zero gradient's fp-noise sign becomes a full-size update and the
    # sharded/unsharded runs can diverge on noise alone.
    import optax

    tx = optax.sgd(1e-3)
    step = make_train_step(cas_mvs_vis_loss, (0.5, 1.0))

    # step() donates its state argument — give each state its own buffers
    state1 = create_train_state(model, jax.tree_util.tree_map(jnp.copy, variables), tx)
    state1, m1, _ = step(state1, batch)

    mesh = make_mesh(data=2, tile=1)
    state2 = create_train_state(model, jax.tree_util.tree_map(jnp.copy, variables), tx)
    sharded = shard_batch(batch, mesh)
    state2, m2, _ = step(state2, sharded)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params), jax.tree_util.tree_leaves(state2.params)
    ):
        # cross-device reduction order differs from single-device: fp noise only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_trainer_on_mesh_matches_single_device(synthetic_scene, tmp_path):
    """The PRODUCTION path (cli.cmd_train --data_parallel -> Trainer(mesh=...)
    -> shard_batch) must produce the same loss as the single-device Trainer
    (VERDICT r3 item 3 'done' criterion)."""
    from tests.test_models import scene_batch
    from adamvs_tpu.models import cas_mvs_vis_loss
    from adamvs_tpu.parallel import make_mesh
    from adamvs_tpu.train import Trainer, create_train_state, make_optimizer

    imgs, projs, dv = scene_batch(synthetic_scene)
    B = 2
    imgs = jnp.concatenate([imgs] * B)
    projs = {k: jnp.concatenate([v] * B) for k, v in projs.items()}
    dv = jnp.concatenate([dv] * B)
    gt = np.repeat(synthetic_scene.views[0].depth[None], B, axis=0)
    batch = {
        "imgs": imgs,
        "proj_matrices": projs,
        "depth_values": dv,
        "depth": {"stage1": jnp.asarray(gt[:, ::4, ::4]), "stage2": jnp.asarray(gt)},
        "mask": {
            "stage1": jnp.ones((B,) + gt.shape[1:])[:, ::4, ::4],
            "stage2": jnp.ones((B,) + gt.shape[1:]),
        },
        "depth_interval": jnp.full((B,), synthetic_scene.depth_interval, jnp.float32),
    }
    model = AdaMVS(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4,
                   cr_base=(4, 4))
    variables = model.init(KEY, imgs, projs, dv)

    def fresh_state():
        sv = jax.tree_util.tree_map(jnp.copy, variables)
        return create_train_state(model, sv, make_optimizer(lr=1e-3))

    mesh = make_mesh(data=2, tile=1)
    t_mesh = Trainer(model, cas_mvs_vis_loss, fresh_state(),
                     str(tmp_path / "mesh"), num_stages=2,
                     log_fn=lambda *a: None, mesh=mesh, ckpt_step_freq=0)
    loss_mesh = t_mesh.train_epoch(0, [batch])["loss"]

    t_one = Trainer(model, cas_mvs_vis_loss, fresh_state(),
                    str(tmp_path / "one"), num_stages=2,
                    log_fn=lambda *a: None, mesh=None, ckpt_step_freq=0)
    loss_one = t_one.train_epoch(0, [batch])["loss"]

    assert np.isfinite(loss_mesh)
    assert abs(loss_mesh - loss_one) < 1e-5 * max(1.0, abs(loss_one)), (
        loss_mesh, loss_one)


def _replicated_batch(synthetic_scene, B):
    from tests.test_models import scene_batch

    imgs, projs, dv = scene_batch(synthetic_scene)
    imgs = jnp.concatenate([imgs] * B)
    projs = {k: jnp.concatenate([v] * B) for k, v in projs.items()}
    dv = jnp.concatenate([dv] * B)
    gt = np.repeat(synthetic_scene.views[0].depth[None], B, axis=0)
    return {
        "imgs": imgs,
        "proj_matrices": projs,
        "depth_values": dv,
        "depth": {"stage1": jnp.asarray(gt[:, ::4, ::4]), "stage2": jnp.asarray(gt)},
        "mask": {
            "stage1": jnp.ones((B,) + gt.shape[1:])[:, ::4, ::4],
            "stage2": jnp.ones((B,) + gt.shape[1:]),
        },
        "depth_interval": jnp.full((B,), synthetic_scene.depth_interval, jnp.float32),
    }


def test_eval_epoch_drops_ragged_final_batch(synthetic_scene, tmp_path):
    """A final val batch not divisible by the data axis must be dropped with
    a logged count, not crash sharding (VERDICT r4 weak item 6)."""
    from adamvs_tpu.models import cas_mvs_vis_loss
    from adamvs_tpu.parallel import make_mesh
    from adamvs_tpu.train import Trainer, create_train_state, make_optimizer

    full = _replicated_batch(synthetic_scene, 2)
    ragged = _replicated_batch(synthetic_scene, 1)
    model = AdaMVS(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4,
                   cr_base=(4, 4))
    variables = model.init(
        KEY, full["imgs"], full["proj_matrices"], full["depth_values"])
    state = create_train_state(model, variables, make_optimizer(lr=1e-3))
    logs = []
    trainer = Trainer(model, cas_mvs_vis_loss, state, str(tmp_path / "r"),
                      num_stages=2, log_fn=logs.append,
                      mesh=make_mesh(data=2, tile=1), ckpt_step_freq=0)
    means = trainer.eval_epoch(0, [full, ragged])
    assert np.isfinite(means["loss"])
    assert any("dropped 1" in m for m in logs), logs


def test_trainer_eval_with_fused_reg_config(synthetic_scene, tmp_path):
    """`cli train --reg_impl precomp` must survive the eval epoch: the eval
    step re-packs the regularizer tree from current params (ADVICE r4)."""
    from adamvs_tpu.models import cas_mvs_vis_loss
    from adamvs_tpu.train import Trainer, create_train_state, make_optimizer

    from jax.experimental.pallas import tpu as pltpu

    batch = _replicated_batch(synthetic_scene, 1)
    model = AdaMVS(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4,
                   cr_base=(4, 4), sweep_impl="fusedf32", reg_impl="precomp")
    with pltpu.force_tpu_interpret_mode():
        variables = model.init(
            KEY, batch["imgs"], batch["proj_matrices"], batch["depth_values"])
        state = create_train_state(model, variables, make_optimizer(lr=1e-3))
        trainer = Trainer(model, cas_mvs_vis_loss, state, str(tmp_path / "p"),
                          num_stages=2, log_fn=lambda *a: None, ckpt_step_freq=0)
        trainer.train_epoch(0, [batch])
        means = trainer.eval_epoch(0, [batch])
    assert np.isfinite(means["loss"])
