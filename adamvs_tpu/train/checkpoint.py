"""Orbax checkpointing.

Replaces the reference's ``torch.save({'epoch','model','optimizer'})`` scheme
(train_whu.py:168-173, 201-207) with Orbax: params + batch_stats + opt_state +
step/epoch, epoch checkpoints named ``model_{epoch:06d}[_{metric:.4f}]`` so the
metric-tagged retention convention (``model_000019_0.1339.ckpt``) carries over.
``--resume`` picks the latest by epoch number, as the reference sorts filenames
(train_whu.py:120-129).
"""

from __future__ import annotations

import os
import re

import jax
import orbax.checkpoint as ocp


def _tree_for_save(state) -> dict:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "nan_steps": state.nan_steps,
    }


# One long-lived async checkpointer: Orbax's StandardCheckpointer saves in a
# background thread once the device->host copy is done, so the train loop
# (SURVEY §5 plan: async save) resumes after the copy instead of blocking on
# directory + array serialization. At most one save is in flight; the next
# save (or any restore / interpreter exit) waits for it.
_CKPTR: ocp.StandardCheckpointer | None = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
        import atexit

        atexit.register(wait_for_checkpoints)
    return _CKPTR


def wait_for_checkpoints():
    """Block until any in-flight async save has committed to disk."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(logdir: str, state, epoch: int, metric: float | None = None,
                    tag: str | None = None, block: bool = False) -> str:
    name = f"model_{epoch:06d}"
    if metric is not None:
        name += f"_{metric:.4f}"
    if tag is not None:
        name += f"_{tag}"
    path = os.path.abspath(os.path.join(logdir, name))
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    ckptr.save(path, _tree_for_save(state), force=True)
    if block:
        ckptr.wait_until_finished()
    return path


# model_{epoch}[_{metric}][_step{N}] — group 2 present only for mid-epoch
# step-tagged saves (Trainer.train_epoch), which must NOT advance the resume
# epoch: resuming from one repeats epoch E rather than silently skipping the
# un-trained remainder of it.
_CKPT_RE = re.compile(r"^model_(\d{6})(?:_[0-9.]+)?(?:_step(\d+))?$")


def _ckpt_key(name: str) -> tuple[int, int, int] | None:
    """Sort key (epoch, is_epoch_final, step) — an end-of-epoch checkpoint
    outranks any step checkpoint of the same epoch."""
    m = _CKPT_RE.match(name)
    if not m:
        return None
    step = int(m.group(2)) if m.group(2) else -1
    return (int(m.group(1)), 1 if step < 0 else 0, step)


def latest_checkpoint(logdir: str) -> str | None:
    wait_for_checkpoints()  # an in-flight save must be listable
    if not os.path.isdir(logdir):
        return None
    best = None
    for name in os.listdir(logdir):
        key = _ckpt_key(name)
        if key is not None and os.path.isdir(os.path.join(logdir, name)):
            if best is None or key >= best[0]:
                best = (key, name)
    return os.path.join(logdir, best[1]) if best else None


def checkpoint_epoch(path: str) -> int:
    m = _CKPT_RE.match(os.path.basename(path))
    return int(m.group(1)) if m else 0


def next_epoch_after(path: str) -> int:
    """Epoch index to run next when resuming from ``path``: epoch+1 for an
    end-of-epoch checkpoint, the same epoch for a mid-epoch step checkpoint."""
    m = _CKPT_RE.match(os.path.basename(path))
    if not m:
        return 0
    epoch = int(m.group(1))
    return epoch if m.group(2) else epoch + 1


def restore_checkpoint(path: str, state, restore_opt: bool | None = None):
    """Restore into an existing (abstract-compatible) state; returns new state.

    ``restore_opt=None`` (default) restores the optimizer state only when its
    checkpointed structure matches the current optimizer — an eval/predict
    run built with a different optimizer chain (e.g. constant lr vs schedule)
    still restores params/batch_stats/step cleanly.
    """
    wait_for_checkpoints()  # a just-scheduled async save must be visible
    path = os.path.abspath(path)
    tree = _tree_for_save(state)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, tree)
    restored = None
    with ocp.StandardCheckpointer() as ckptr:
        if restore_opt is None:
            try:
                restored = ckptr.restore(path, abstract)
                restore_opt = True
            except Exception:
                restored = None
    if restored is None or restore_opt is False:
        partial = {k: v for k, v in abstract.items() if k != "opt_state"}
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            restored = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(item=partial, partial_restore=True)
            )
        restore_opt = False
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"] if restore_opt else state.opt_state,
        step=restored["step"],
        nan_steps=restored["nan_steps"],
    )
