"""TPU compile+parity probe for the panel-loop ada_red_scan (run from repo root)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from adamvs_tpu.nn.costreg import AdaRedCell
from adamvs_tpu.ops.red_scan import ada_red_scan, pack_red_params, spatialize, pick_tile_rows

def ref_scan(cell, variables, vol):
    D, B, h, w, C = vol.shape
    carry = cell.init_carry(B, h, w, vol.dtype)
    outs = []
    for d in range(D):
        carry, cost = cell.apply(variables, carry, vol[d])
        outs.append(cost[..., 0])
    return jnp.stack(outs)

def probe(D, B, h, w, C, base, up, dt, check=True):
    rng = np.random.RandomState(0)
    cell = AdaRedCell(base, up)
    carry0 = cell.init_carry(B, h, w)
    variables = cell.init(jax.random.PRNGKey(2), carry0, jnp.zeros((B, h, w, C)))
    if dt == jnp.bfloat16:
        variables = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), variables)
    vol = jnp.asarray(rng.randn(D, B, h, w, C).astype(np.float32)).astype(dt)
    packed = pack_red_params(variables["params"], up)
    th = pick_tile_rows(w)
    vs = spatialize(vol, th)
    t0 = time.time()
    got = ada_red_scan(packed, vs, C, base, up, h, w, tile_rows=th)
    s = float(jnp.sum(got.astype(jnp.float32)))  # flush axon relay
    t_compile = time.time() - t0
    # steady-state timing
    t1 = time.time()
    for _ in range(3):
        got = ada_red_scan(packed, vs, C, base, up, h, w, tile_rows=th)
        s = float(jnp.sum(got.astype(jnp.float32)))
    t_run = (time.time() - t1) / 3
    line = f"shape D={D} h={h} w={w} C={C} up={up} dt={got.dtype} th={th}: compile+1st={t_compile:.1f}s run={t_run*1e3:.0f}ms"
    if check:
        want = ref_scan(cell, variables, vol)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        scale = float(jnp.std(want.astype(jnp.float32))) + 1e-9
        line += f" relerr={err/scale:.2e}"
    print(line, flush=True)

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "small"
    if which == "small":
        probe(5, 1, 44, 74, 8, 8, True, jnp.float32)
        probe(5, 1, 44, 74, 8, 8, False, jnp.float32)
    elif which == "s1":
        probe(48, 1, 688, 464, 32, 8, True, jnp.bfloat16, check=False)
    elif which == "s2":
        probe(32, 1, 1376, 928, 16, 8, True, jnp.bfloat16, check=False)
    elif which == "s3":
        probe(8, 1, 2752, 1856, 8, 8, False, jnp.bfloat16, check=False)
