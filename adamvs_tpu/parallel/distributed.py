"""Multi-host runtime initialization.

The reference has no multi-host story (single-process DataParallel,
train_whu.py:110). Here multi-host runs initialize the JAX distributed runtime
once per process; data-parallel training then shards the global batch over all
devices via the (data, tile) mesh, with gradient all-reduce over ICI within a
slice and DCN across slices, and predict distributes work items by
``jax.process_index()`` (predict/engine.py).

Launch (one process per host), e.g.:

    JAX_COORDINATOR=host0:1234 NUM_PROCESSES=4 PROCESS_ID=$i \
        python -m adamvs_tpu.cli train --distributed ...

On Cloud TPU pods, ``jax.distributed.initialize()`` auto-discovers all three
values from the TPU metadata and the env vars are unnecessary.
"""

from __future__ import annotations

import os

import jax


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Idempotent ``jax.distributed.initialize`` with env-var fallbacks.

    NOTE: must not touch ``jax.process_count()``/``jax.devices()`` before
    initializing — they eagerly create the local (single-process) backend,
    after which distributed initialization cannot take effect."""
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # already initialized
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")
    explicit = coordinator is not None and num_processes is not None
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        if explicit:
            # a requested multi-process setup failing must be LOUD — the old
            # silent fallback masked exactly this (each process proceeding
            # single-process and re-doing the whole work list)
            raise
        # auto-detection on single-process runs proceeds as-is


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v else None
