"""Tile-sharded (row-band) prediction over a device mesh.

The cost volume is per-pixel independent given features (SURVEY.md §5
long-context analog), so one large reference frame is sharded across the
``tile`` mesh axis by image rows:

1. Features are extracted on the FULL frame, replicated on every device (the
   feature net is a small fraction of total cost, and the plane-sweep warp
   must sample source features anywhere in the frame).
2. Under ``shard_map``, each device slices its reference row band — extended
   by a static halo covering the regularizers' receptive field — adjusts the
   reference projection for the row offset (``P'[1,:] = P[1,:] - r0·P[2,:]``),
   and runs the full cascade on the band via the models' precomputed-features
   path (tuple form: band ref + full src).
3. The halo is cropped and the depth/confidence bands concatenate along rows
   via the output sharding. No communication happens inside the cascade at
   all — the overlap-tile scheme trades ``halo/band`` redundant compute for
   zero halo-exchange collectives, the right trade on ICI for these tiny
   per-row costs.

Interior rows are bit-comparable to the unsharded result (convs/GRUs see
identical neighborhoods inside the halo; BN uses running stats in eval).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# default full-res halo: covers the stage-1 2D U-Net regularizer's receptive
# field (~50 px at 1/4 res => ~200 full-res rows) plus the recurrent cells'
HALO_ROWS = 256


def _band_ref_proj(proj_stage: jnp.ndarray, row_start) -> jnp.ndarray:
    """Shift the reference view's principal row for a band starting at
    ``row_start`` (stage-resolution rows). proj_stage: [B,V,4,4]."""
    ref = proj_stage[:, 0]
    shifted = ref.at[:, 1, :].add(-row_start * ref[:, 2, :])
    return proj_stage.at[:, 0].set(shifted)


def tiled_forward(
    model,
    variables: dict,
    imgs: jnp.ndarray | None,  # [1,V,H,W,3]
    proj_matrices: dict[str, jnp.ndarray],
    depth_values: jnp.ndarray,
    mesh: Mesh,
    num_depth: int | None = None,
    halo: int = HALO_ROWS,
    features: dict[str, jnp.ndarray] | None = None,
):
    """Full-frame forward with rows sharded over mesh axis 'tile'.

    ``features``: optional precomputed full-frame pyramid
    {stageK: [B,V,h,w,C]} (e.g. from the engine's cross-sample cache);
    ``imgs`` may be None then.

    Returns (depth [1,H,W], confidence [1,H,W]) with row-sharded layout.
    """
    num_stages = len(model.ndepths)
    if features is not None:
        # stage1 always sits at 1/4 image resolution (3-scale feature trunk)
        f1 = features["stage1"]
        B, V = f1.shape[:2]
        H, W = f1.shape[2] * 4, f1.shape[3] * 4
        feats_full = features
    else:
        B, V, H, W = imgs.shape[:4]
    n_tiles = mesh.shape["tile"]
    assert H % 32 == 0, f"H={H} must be a multiple of 32 (pad first)"
    assert H % (n_tiles * 4) == 0, f"H={H} must divide into {n_tiles} 4-aligned bands"
    rows = H // n_tiles
    # the cascade's down/up chains need 32-divisible band heights
    band_h = min(H, -(-(rows + 2 * halo) // 32) * 32)

    if features is None:
        # 1. full-frame features, replicated
        feat_mod = model.feature_module()
        feat_vars = {"params": variables["params"]["feature"]}
        if "batch_stats" in variables and "feature" in variables["batch_stats"]:
            feat_vars["batch_stats"] = variables["batch_stats"]["feature"]
        flat = imgs.reshape((B * V,) + imgs.shape[2:])
        feats_full = feat_mod.apply(feat_vars, flat, False)
        feats_full = {k: v.reshape((B, V) + v.shape[1:]) for k, v in feats_full.items()}

    # final output resolution factor (AdaMVS 2-stage cascades end 2x above
    # the last stage's input res; 3-stage ends at full res)
    out_mul = 1

    def band_fn(variables, feats_full, proj_matrices, depth_values):
        i = jax.lax.axis_index("tile")
        # 4-aligned so every stage's row offset is integral
        start = (jnp.clip(i * rows - halo, 0, H - band_h) // 4) * 4
        off = i * rows - start  # valid-row offset inside the band

        band_feats = {}
        band_projs = {}
        for k in range(1, num_stages + 1):
            key = f"stage{k}"
            # stage k features sit at 1/2^(3-k) image res for ANY cascade
            # length (the trunk is always 3-scale: H/4, H/2, H)
            s = 2 ** (3 - k)
            fs = feats_full[key]  # [B,V,h,w,C]
            start_s = start // s
            ref_band = jax.lax.dynamic_slice_in_dim(fs[:, 0], start_s, band_h // s, axis=1)
            src_full = jnp.moveaxis(fs[:, 1:], 1, 0)  # [V-1,B,h,w,C]
            band_feats[key] = (ref_band, src_full)
            band_projs[key] = _band_ref_proj(proj_matrices[key], start_s)

        out = model.apply(
            variables, None, band_projs, depth_values,
            train=False, num_depth=num_depth, features=band_feats,
        )
        depth = out["depth"]  # [B, band_h*out_mul, W*out_mul]
        conf = out["photometric_confidence"]
        depth = jax.lax.dynamic_slice_in_dim(depth, off * out_mul, rows * out_mul, axis=1)
        conf = jax.lax.dynamic_slice_in_dim(conf, off * out_mul, rows * out_mul, axis=1)
        return depth, conf

    fn = jax.shard_map(
        band_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(None, "tile", None), P(None, "tile", None)),
        check_vma=False,
    )
    return fn(variables, feats_full, proj_matrices, depth_values)


def make_tiled_predict_fn(model, mesh: Mesh, num_depth: int, halo: int = HALO_ROWS):
    """Jitted (variables, imgs, projs, depth_values) -> (depth, conf)."""

    @jax.jit
    def fn(variables, imgs, projs, dv):
        return tiled_forward(
            model, variables, imgs, projs, dv, mesh, num_depth=num_depth, halo=halo
        )

    return fn


def make_tiled_predict_feat_fn(model, mesh: Mesh, num_depth: int,
                               halo: int = HALO_ROWS):
    """Jitted (variables, features, projs, depth_values) -> (depth, conf) —
    the cache-composable form: full-frame pyramids come from the engine's
    cross-sample feature cache instead of being recomputed per work item."""

    @jax.jit
    def fn(variables, features, projs, dv):
        return tiled_forward(
            model, variables, None, projs, dv, mesh, num_depth=num_depth,
            halo=halo, features=features,
        )

    return fn
