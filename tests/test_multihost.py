"""Multi-host execution: two REAL processes (CPU backend, localhost
coordinator) drive ``initialize_distributed`` and the predict work queue —
the paths that had never run with process_count > 1. Asserts both processes
join the coordination service, partition the view list disjointly, and
together cover every work item with valid outputs."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from adamvs_tpu.parallel.distributed import initialize_distributed

    pid = int(sys.argv[1])
    initialize_distributed(coordinator={coord!r}, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    from adamvs_tpu.data.lists import build_predict_list
    from adamvs_tpu.models import AdaMVS
    from adamvs_tpu.predict.engine import PredictEngine

    source = build_predict_list({src!r}, view_num=3)
    model = AdaMVS(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4,
                   cr_base=(4, 4))
    import jax.numpy as jnp
    # conv params are size-independent: init on a small padded dummy shape
    imgs = jnp.zeros((1, 3, 64, 64, 3), jnp.float32)
    projs = {{f"stage{{k}}": jnp.tile(jnp.eye(4), (1, 3, 1, 1)).astype(jnp.float32)
             for k in (1, 2)}}
    dv = jnp.asarray([[300.0, 500.0]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv, num_depth=16)
    eng = PredictEngine(model, variables, num_depth=16, log_fn=lambda *_: None)
    written = eng.run(source, {out!r} + f"/p{{pid}}",
                                 load_kwargs={{"resize_scale": 1.0}})
    # several views share one vid folder: dedupe folders, collect pfms
    names = sorted({{f for d in set(written) for f in os.listdir(d)
                    if f.endswith("_init.pfm")}})
    print("RESULT" + json.dumps({{"pid": pid, "names": names}}))
""")


def test_two_process_predict_work_queue(tmp_path):
    from adamvs_tpu.data.synthetic import make_scene, write_predict_source_tree

    scene = make_scene(num_views=4, height=96, width=128, seed=0)
    src = str(tmp_path / "source")
    write_predict_source_tree(src, scene)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    out = str(tmp_path / "out")
    script = WORKER.format(repo=REPO, coord=coord, src=src, out=out)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no 8-device virtualization in the workers
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=560)
        outs.append(stdout)
        assert p.returncode == 0, stdout[-3000:]

    import json

    results = {}
    for stdout in outs:
        line = [l for l in stdout.splitlines() if l.startswith("RESULT")][0]
        d = json.loads(line[len("RESULT"):])
        results[d["pid"]] = d["names"]

    # disjoint round-robin split covering all 4 views
    assert len(results) == 2
    all_names = sorted(results[0] + results[1])
    assert set(results[0]).isdisjoint(results[1])
    assert len(results[0]) == len(results[1]) == 2
    assert all_names == sorted(
        f"view_{i:03d}_init.pfm" for i in range(4)
    )


TRAIN_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from adamvs_tpu.parallel.distributed import initialize_distributed

    pid = int(sys.argv[1])
    initialize_distributed(coordinator={coord!r}, num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    from adamvs_tpu.models import AdaMVS, cas_mvs_vis_loss
    from adamvs_tpu.parallel import make_mesh
    from adamvs_tpu.train import Trainer, create_train_state, make_optimizer

    B, V, H, W = 2, 2, 32, 32
    rng = np.random.RandomState(0)
    imgs = rng.randn(B, V, H, W, 3).astype(np.float32)
    proj = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    projs = {{f"stage{{k}}": proj for k in (1, 2)}}
    dv = np.tile(np.array([[10.0, 20.0, 1.0]], np.float32), (B, 1))
    gt = rng.uniform(12, 18, (B, H, W)).astype(np.float32)
    gbatch = {{
        "imgs": imgs, "proj_matrices": projs, "depth_values": dv,
        "depth": {{"stage1": gt[:, ::4, ::4], "stage2": gt}},
        "mask": {{"stage1": np.ones((B, H // 4, W // 4), np.float32),
                 "stage2": np.ones((B, H, W), np.float32)}},
        "depth_interval": np.full((B,), 1.0, np.float32),
    }}
    # contiguous per-process slice of the global batch (shard_batch assembles
    # the global array via make_array_from_process_local_data)
    local = jax.tree_util.tree_map(lambda x: x[pid * 1:(pid + 1) * 1], gbatch)

    model = AdaMVS(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4,
                   cr_base=(4, 4))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(imgs), projs, jnp.asarray(dv))
    mesh = make_mesh(data=2, tile=1)
    state = create_train_state(model, variables, make_optimizer(lr=1e-3))
    tr = Trainer(model, cas_mvs_vis_loss, state, {out!r} + f"/log{{pid}}",
                 num_stages=2, log_fn=lambda *_: None, mesh=mesh,
                 ckpt_step_freq=0)
    means = tr.train_epoch(0, [local])
    print("RESULT" + json.dumps({{"pid": pid, "loss": float(means["loss"])}}))
""")


def test_two_process_data_parallel_training(tmp_path):
    """CLI-path multi-host SPMD training (the reference's one parallelism,
    train_whu.py:110, pod-scaled): two REAL processes form a data=2 mesh,
    each supplies its local slice of the global batch, and the Trainer step
    produces the same loss on both hosts AND equals the single-process loss
    on the full batch."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    out = str(tmp_path / "out")
    script = TRAIN_WORKER.format(repo=REPO, coord=coord, out=out)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=560)
        outs.append(stdout)
        assert p.returncode == 0, stdout[-3000:]

    import json

    losses = {}
    for stdout in outs:
        line = [l for l in stdout.splitlines() if l.startswith("RESULT")][0]
        d = json.loads(line[len("RESULT"):])
        losses[d["pid"]] = d["loss"]
    assert len(losses) == 2
    assert abs(losses[0] - losses[1]) < 1e-6 * max(1.0, abs(losses[0]))

    # single-process reference on the SAME global batch
    import numpy as np
    import jax
    import jax.numpy as jnp
    from adamvs_tpu.models import AdaMVS, cas_mvs_vis_loss
    from adamvs_tpu.train import Trainer, create_train_state, make_optimizer

    B, V, H, W = 2, 2, 32, 32
    rng = np.random.RandomState(0)
    imgs = rng.randn(B, V, H, W, 3).astype(np.float32)
    proj = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    projs = {f"stage{k}": proj for k in (1, 2)}
    dv = np.tile(np.array([[10.0, 20.0, 1.0]], np.float32), (B, 1))
    gt = rng.uniform(12, 18, (B, H, W)).astype(np.float32)
    gbatch = {
        "imgs": imgs, "proj_matrices": projs, "depth_values": dv,
        "depth": {"stage1": gt[:, ::4, ::4], "stage2": gt},
        "mask": {"stage1": np.ones((B, H // 4, W // 4), np.float32),
                 "stage2": np.ones((B, H, W), np.float32)},
        "depth_interval": np.full((B,), 1.0, np.float32),
    }
    model = AdaMVS(ndepths=(8, 4), depth_intervals_ratio=(4.0, 2.0), base=4,
                   cr_base=(4, 4))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs), projs,
                           jnp.asarray(dv))
    state = create_train_state(model, variables, make_optimizer(lr=1e-3))
    tr = Trainer(model, cas_mvs_vis_loss, state, str(tmp_path / "ref"),
                 num_stages=2, log_fn=lambda *_: None, ckpt_step_freq=0)
    ref_loss = tr.train_epoch(0, [gbatch])["loss"]
    assert abs(losses[0] - ref_loss) < 1e-4 * max(1.0, abs(ref_loss)), (
        losses[0], ref_loss)
