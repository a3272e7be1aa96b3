"""Localize TPU-vs-interpret divergence in ada_red_scan (run from repo root)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from adamvs_tpu.nn.costreg import AdaRedCell
from adamvs_tpu.ops.red_scan import ada_red_scan, pack_red_params, spatialize, pick_tile_rows

def run(D, B, h, w, C, base, up, th):
    rng = np.random.RandomState(0)
    cell = AdaRedCell(base, up)
    carry0 = cell.init_carry(B, h, w)
    variables = cell.init(jax.random.PRNGKey(2), carry0, jnp.zeros((B, h, w, C)))
    vol = jnp.asarray(rng.randn(D, B, h, w, C).astype(np.float32))
    packed = pack_red_params(variables["params"], up)
    vs = spatialize(vol, th)
    tpu = np.asarray(ada_red_scan(packed, vs, C, base, up, h, w, tile_rows=th))
    itp = np.asarray(ada_red_scan(packed, vs, C, base, up, h, w, tile_rows=th, interpret=True))
    d = np.abs(tpu - itp)
    print(f"D={D} h={h} w={w} up={up} th={th}: max|tpu-itp|={d.max():.3e} "
          f"std={itp.std():.3e}", flush=True)
    if d.max() > 1e-4 * (itp.std() + 1e-9):
        # where is the error? report per-depth and bounding box on worst depth
        per_d = d.reshape(D, -1).max(axis=1)
        print("  per-depth max:", np.array2string(per_d, precision=2), flush=True)
        dd = int(per_d.argmax())
        m = d[dd, 0]
        ys, xs = np.where(m > 0.5 * m.max())
        print(f"  worst d={dd}: rows [{ys.min()},{ys.max()}] cols [{xs.min()},{xs.max()}] of ({m.shape})", flush=True)

if __name__ == "__main__":
    run(1, 1, 44, 74, 8, 8, False, 48)   # single step, single tile
    run(2, 1, 44, 74, 8, 8, False, 48)   # two steps (carry round-trip)
    run(5, 1, 44, 74, 8, 8, False, 16)   # multi-tile (the passing test's th)
