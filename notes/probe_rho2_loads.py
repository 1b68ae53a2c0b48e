import sys; sys.path.insert(0, "/root/repo")
"""Measure per-region loads at headline scale to pin down overflow."""
import jax
import jax.numpy as jnp
import numpy as np

from aqp_tpu.data import create_relation_fk, create_relation_pk
from aqp_tpu.ops.pallas import rho2 as R

sub, F1 = 512, 16
NR, NS = 13_107_200, 52_428_800
r = create_relation_pk(NR, seed=11111)
s = create_relation_fk(NS, NR, seed=22222)

block = sub * R.LANES
packed = jnp.concatenate([r.key << 1, (s.key << 1) | 1])
pay = jnp.concatenate([r.payload, s.payload])
packed = R._pad_to(packed, block, R.KEY_PAD_INT)
pay = R._pad_to(pay, block, 0)
n = packed.shape[0]
nb = n // block
rows_total = n // R.LANES
fill1 = 0.85
c1_rows = -(-int(rows_total / F1 / fill1) // sub) * sub
c1_blocks = c1_rows // sub
avail = int(0.97 * sub) - 2 * c1_blocks
F2 = max(1, -(-int(rows_total / F1) // avail))
gmax = F1 * F2
print(f"nb={nb} c1_rows={c1_rows} c1_blocks={c1_blocks} F2={F2} gmax={gmax}",
      flush=True)

maxk = jnp.max(packed >> 1, initial=jnp.int32(0), where=packed != R.KEY_PAD_INT)
scale1 = (jnp.float32(F1) / (maxk.astype(jnp.float32) + 1.0)) * jnp.float32(1 - 1e-6)
scaleg = (jnp.float32(gmax) / (maxk.astype(jnp.float32) + 1.0)) * jnp.float32(1 - 1e-6)

ks1, ps1, starts1 = R.sort_hist(packed, pay, scale1, sub, F1)
soff1, doff1, sz1, ovf1 = R._plan(nb, sub, starts1, F1, c1_rows)
tot1 = np.asarray(jnp.sum(sz1.reshape(nb, F1), axis=0))
print(f"L1 loads: max={tot1.max()} mean={tot1.mean():.0f} cap={c1_rows} "
      f"ovf1={int(ovf1)}", flush=True)

out1_rows = F1 * c1_rows + 1
k1, p1 = R.scatter_segments(ks1, ps1, soff1, doff1, sz1, nb * F1, out1_rows)
k1 = k1[: F1 * c1_rows]
p1 = p1[: F1 * c1_rows]
ks2, ps2, starts2 = R.sort_hist(k1.reshape(-1), p1.reshape(-1), scaleg, sub,
                                F1, c1_blocks=c1_blocks, f2=F2)
babs, r0, doff2, sz2, ovf2 = R._plan2(starts2, c1_blocks, F2, sub)
tot2 = np.asarray(jnp.sum(sz2, axis=1))  # (nr1, f2)
print(f"L2 loads: max={tot2.max()} mean={tot2.mean():.0f} cap={sub} "
      f"ovf2={int(ovf2)}", flush=True)
flat = tot2.reshape(-1)
print("worst regions:", np.sort(flat)[-8:], flush=True)
# distribution of per-(block,bucket) segment sizes
s2 = np.asarray(sz2).reshape(-1)
print(f"seg2 rows: mean={s2.mean():.2f} p99={np.percentile(s2,99):.0f} "
      f"max={s2.max()}", flush=True)
