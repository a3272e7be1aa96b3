"""Device mesh and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(train_whu.py:110). Here parallelism is first-class JAX SPMD:

- training: 1D/2D mesh with the batch sharded over the ``data`` axis; gradient
  all-reduce over ICI is inserted by XLA's partitioner under ``jit``.
- prediction: the ``tile`` axis shards image rows; cost-volume rows are
  per-pixel independent given features, so XLA partitions the plane-sweep and
  regularizer convs with automatic halo exchange (see predict/engine.py for
  the overlap-tile alternative that avoids halo collectives entirely).

All helpers are no-ops on a single device.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, tile: int = 1, devices=None) -> Mesh:
    """Build a (data, tile) mesh. ``data=None`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % tile == 0, f"{n} devices not divisible by tile={tile}"
        data = n // tile
    assert data * tile <= n, f"mesh {data}x{tile} needs more than {n} devices"
    grid = np.array(devices[: data * tile]).reshape(data, tile)
    return Mesh(grid, ("data", "tile"))


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding."""
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch, mesh: Mesh):
    """Shard a train/eval batch dict: every leaf's leading (batch) axis over
    ``data``, and — when the mesh has a non-trivial ``tile`` axis — image rows
    over ``tile`` (imgs [B,V,H,W,3] on axis 2, per-stage depth/mask [B,h,w]
    on axis 1).

    Single-process meshes use a plain device_put; on a multi-host mesh each
    process passes its LOCAL slice of the global batch and the global array is
    assembled across processes (each host loads a disjoint sample-list shard,
    cli.cmd_train)."""
    multihost = jax.process_count() > 1
    tiled = "tile" in mesh.axis_names and mesh.shape["tile"] > 1

    def put(x, spec):
        s = NamedSharding(mesh, spec)
        if multihost:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    def spec_for(path, x):
        if not tiled:
            return P("data")
        top = path[0].key if hasattr(path[0], "key") else None
        if top == "imgs":
            return P("data", None, "tile")
        if top in ("depth", "mask"):
            return P("data", "tile")
        return P("data")

    return jax.tree_util.tree_map_with_path(
        lambda path, x: put(x, spec_for(path, x)), batch
    )
