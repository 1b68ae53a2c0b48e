import sys; sys.path.insert(0, "/root/repo")
"""Tier-2 pipeline on real TPU: correctness then headline timing."""
import os, time
SUB1 = int(os.environ.get("SUB1", "512")); SUB2 = int(os.environ.get("SUB2", "512"))
import jax, jax.numpy as jnp
import numpy as np
from aqp_tpu.ops.pallas.radix_pipeline import rho_join_count_tier2
from aqp_tpu.data import create_relation_pk, create_relation_fk

def overhead():
    tiny = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: jnp.sum(x))
    int(f(tiny))
    t0 = time.perf_counter()
    for _ in range(5):
        int(f(tiny))
    return (time.perf_counter() - t0) / 5

OH = overhead()
print(f"overhead {OH*1e3:.1f} ms", flush=True)

# small correctness on TPU
nr, ns = 1 << 14, 1 << 16
r = create_relation_pk(nr); s = create_relation_fk(ns, nr)
t0 = time.perf_counter()
m, c, ovf = rho_join_count_tier2(r.key, r.payload, s.key, s.payload,
                                 sub1=SUB1, sub2=SUB2)
m, c, ovf = int(m), int(c), int(ovf)
print(f"small: compile+run {time.perf_counter()-t0:.1f}s matches={m} ovf={ovf}",
      flush=True)
assert ovf == 0 and m == ns, (m, ns, ovf)

# headline size
NR, NS = 13_107_200, 52_428_800
r = create_relation_pk(NR, seed=11111)
s = create_relation_fk(NS, NR, seed=22222)
jax.block_until_ready((r.key, s.key))
t0 = time.perf_counter()
m, c, ovf = rho_join_count_tier2(r.key, r.payload, s.key, s.payload,
                                 sub1=SUB1, sub2=SUB2)
m, ovf = int(m), int(ovf)
print(f"headline: compile+first {time.perf_counter()-t0:.1f}s matches={m} ovf={ovf}",
      flush=True)
assert ovf == 0 and m == NS, (m, NS, ovf)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = rho_join_count_tier2(r.key, r.payload, s.key, s.payload,
                               sub1=SUB1, sub2=SUB2)
    mm = int(out[0])
    best = min(best, time.perf_counter() - t0)
t = best - OH
print(f"headline join: {t*1e3:.1f} ms  {(NR+NS)/t/1e6:.0f} M rows/s "
      f"(baseline 1491)", flush=True)
print("done", flush=True)
