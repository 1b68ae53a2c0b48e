import sys; sys.path.insert(0, "/root/repo")
"""v2 pipeline on real TPU: correctness then headline timing + phases."""
import os

SUB = int(os.environ.get("SUB", "512"))
if SUB > 512 and "LIBTPU_INIT_ARGS" not in os.environ:
    os.environ["LIBTPU_INIT_ARGS"] = "--xla_tpu_scoped_vmem_limit_kib=100000"
import time

import jax
import jax.numpy as jnp

from aqp_tpu.data import create_relation_fk, create_relation_pk
from aqp_tpu.ops.pallas.rho2 import rho_join_count_v2, sort_hist

F1 = int(os.environ.get("F1", "16"))


def overhead():
    tiny = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: jnp.sum(x))
    f(tiny).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        f(tiny).block_until_ready()
    return (time.perf_counter() - t0) / 5


OH = overhead()
print(f"overhead {OH*1e3:.1f} ms  SUB={SUB} F1={F1}", flush=True)

# small correctness on TPU
nr, ns = 1 << 16, 1 << 18
r = create_relation_pk(nr)
s = create_relation_fk(ns, nr)
t0 = time.perf_counter()
m, c, ovf = rho_join_count_v2(r.key, r.payload, s.key, s.payload, sub=SUB, F1=F1)
m, ovf = int(m), int(ovf)
print(f"small: compile+run {time.perf_counter()-t0:.1f}s matches={m} ovf={ovf}",
      flush=True)
assert ovf == 0 and m == ns, (m, ns, ovf)

# kernel-A-only throughput at headline scale
N = 1 << 26
kk = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 30, jnp.int32)
pp = jnp.arange(N, dtype=jnp.int32)
scale = jnp.float32(F1) / jnp.float32(1 << 30)
jax.block_until_ready((kk, pp))
w, wp, st = sort_hist(kk, pp, scale, SUB, F1)
jax.block_until_ready(w)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    w, wp, st = sort_hist(kk, pp, scale, SUB, F1)
    jax.block_until_ready((w, st))
    best = min(best, time.perf_counter() - t0)
t = best - OH
print(f"kernel-A {N/1e6:.0f}M rows: {t*1e3:.2f} ms  {N/t/1e9:.2f} G rows/s",
      flush=True)

# headline join
NR, NS = 13_107_200, 52_428_800
r = create_relation_pk(NR, seed=11111)
s = create_relation_fk(NS, NR, seed=22222)
jax.block_until_ready((r.key, s.key))
t0 = time.perf_counter()
out = rho_join_count_v2(r.key, r.payload, s.key, s.payload, sub=SUB, F1=F1)
m, ovf = int(out[0]), int(out[2])
print(f"headline: compile+first {time.perf_counter()-t0:.1f}s matches={m} "
      f"ovf={ovf}", flush=True)
assert ovf == 0 and m == NS, (m, NS, ovf)
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    out = rho_join_count_v2(r.key, r.payload, s.key, s.payload, sub=SUB, F1=F1)
    jax.block_until_ready(out)
    int(out[0])
    best = min(best, time.perf_counter() - t0)
t = best - OH
print(f"headline join: {t*1e3:.1f} ms  {(NR+NS)/t/1e6:.0f} M rows/s "
      f"(baseline 1491)", flush=True)
print("done", flush=True)
