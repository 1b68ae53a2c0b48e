"""Round-2: per-stage timing of the rho2 fused pipeline at headline scale.

This platform has ~28 ms dispatch overhead per device call, so each stage is
measured as the DIFFERENCE between cumulative jitted pipeline prefixes, each
returning one scalar (forced via .item()).
"""
import os, time, functools
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from aqp_tpu.data import create_relation_pk, create_relation_fk
from aqp_tpu.ops.pallas.blocksort import KEY_PAD_INT
from aqp_tpu.ops.pallas.rho2 import (
    sort_hist, scatter_segments, region_join, _plan, _plan2, _pad_to,
    PACKED_PAD_MIN,
)

SUB, F1 = 1024, 32
LANES = 128
FILL1, FILL2 = 0.92, 0.88


def stage_fn(upto: int):
    @jax.jit
    def fn(rk, rp, sk, sp):
        block = SUB * LANES
        packed = jnp.concatenate([rk << 1, (sk << 1) | 1])
        pay = jnp.concatenate([rp, sp])
        packed = _pad_to(packed, block, KEY_PAD_INT)
        pay = _pad_to(pay, block, 0)
        n = packed.shape[0]
        nb = n // block
        rows_total = n // LANES
        data_rows = rows_total
        c1_rows = -(-int(data_rows / F1 / FILL1) // SUB) * SUB
        c1_blocks = c1_rows // SUB
        avail = int((SUB - 2 * c1_blocks) * FILL2)
        F2 = max(1, -(-int(data_rows / F1) // avail))
        gmax = F1 * F2
        maxk = jnp.max(packed >> 1, initial=jnp.int32(0),
                       where=packed < PACKED_PAD_MIN)
        scale1 = (jnp.float32(F1) / (maxk.astype(jnp.float32) + 1.0)) * jnp.float32(1 - 1e-6)
        scaleg = (jnp.float32(gmax) / (maxk.astype(jnp.float32) + 1.0)) * jnp.float32(1 - 1e-6)
        if upto == 0:
            return jnp.sum(packed[::65536], dtype=jnp.int32)
        ks1, ps1, starts1 = sort_hist(packed, pay, scale1, SUB, F1)
        if upto == 1:
            return ks1[0, 0] + ps1[0, 0] + starts1[0, 0]
        soff1, doff1, sz1, ovf1 = _plan(nb, SUB, starts1, F1, c1_rows)
        if upto == 2:
            return soff1[0] + doff1[0] + sz1[0] + ovf1
        out1_rows = F1 * c1_rows + 1
        k1, p1 = scatter_segments(ks1, ps1, soff1, doff1, sz1, nb * F1, out1_rows)
        k1 = k1[:F1 * c1_rows]
        p1 = p1[:F1 * c1_rows]
        if upto == 3:
            return k1[0, 0] + p1[0, 0]
        ks2, ps2, starts2 = sort_hist(k1.reshape(-1), p1.reshape(-1), scaleg,
                                      SUB, F1, c1_blocks=c1_blocks, f2=F2)
        if upto == 4:
            return ks2[0, 0] + ps2[0, 0] + starts2[0, 0]
        nb2 = F1 * c1_blocks
        babs, r0, doff2, sz2, ovf2 = _plan2(starts2, c1_blocks, F2, SUB)
        soff2 = (babs * SUB + r0).reshape(-1).astype(jnp.int32)
        out2_rows = gmax * SUB + 1
        k2, p2 = scatter_segments(ks2, ps2, soff2,
                                  doff2.reshape(-1).astype(jnp.int32),
                                  sz2.reshape(-1).astype(jnp.int32),
                                  nb2 * F2, out2_rows)
        k2 = k2[:gmax * SUB]
        p2 = p2[:gmax * SUB]
        if upto == 5:
            return k2[0, 0] + p2[0, 0]
        m, c = region_join(k2, p2, scaleg, SUB, gmax)
        return m + c.astype(jnp.int32) + ovf1 + ovf2
    return fn


NR, NS = 13_107_200, 52_428_800
r = create_relation_pk(NR, seed=11111)
s = create_relation_fk(NS, NR, seed=22222)
jax.block_until_ready((r.key, s.key, r.payload, s.payload))

names = ["pack", "pass1 sort", "plan1", "scatter1", "pass2 sort", "scatter2",
         "region_join"]
times = []
for upto in range(7):
    fn = stage_fn(upto)
    out = fn(r.key, r.payload, s.key, s.payload)
    _ = out.item()
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        _ = fn(r.key, r.payload, s.key, s.payload).item()
        best = min(best, time.perf_counter() - t0)
    times.append(best)
    d = best - (times[upto - 1] if upto else 0)
    print(f"{names[upto]:12s} cum {best*1e3:7.1f} ms   delta {d*1e3:7.1f} ms",
          flush=True)

print(f"total {times[-1]*1e3:.1f} ms -> "
      f"{(NR+NS)/times[-1]/1e6:.0f} M rows/s (incl dispatch)", flush=True)
