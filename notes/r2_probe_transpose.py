"""Probe: cost of tile-transpose and T-layout stages vs lane-gather stages.

Question: can stride<128 compare-exchange stages run cheaper in a
tile-transposed layout (128x128 tile transpose -> lane strides become row
strides -> static slices), with the transpose itself near-free?
"""
import os, time
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

W, LANES = 1024, 128
NB = 512  # same data volume as headline: 512 blocks x 131072 elems

f = jax.jit(lambda x: jnp.sum(x))
int(f(jnp.zeros((8,), jnp.int32)))
t0 = time.perf_counter()
for _ in range(10):
    int(f(jnp.zeros((8,), jnp.int32)))
OH = (time.perf_counter() - t0) / 10
print(f"overhead {OH*1e3:.2f} ms", flush=True)

key = jax.random.PRNGKey(0)
kw = jax.random.randint(key, (NB * W, LANES), 0, 1 << 30, jnp.int32)
pw = jax.random.randint(key, (NB * W, LANES), 0, 1 << 30, jnp.int32)
jax.block_until_ready((kw, pw))


def run_kernel(name, kern, n_out=2):
    grid = (NB,)
    call = jax.jit(lambda a, b: pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((W, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((W, LANES), lambda i: (i, 0))] * n_out,
        out_shape=[jax.ShapeDtypeStruct((NB * W, LANES), jnp.int32)] * n_out,
    )(a, b))
    from aqp_tpu.utils.timing import hard_sync
    out = call(kw, pw)
    hard_sync(out)
    REP = 4
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REP):
            out = call(kw, pw)
        hard_sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/REP*1e3:.2f} ms", flush=True)
    return best / REP


# 0) pure copy: r/w floor
def k_copy(k_ref, p_ref, ok, op):
    ok[:] = k_ref[:]
    op[:] = p_ref[:]
run_kernel("copy (r/w floor)", k_copy)


# 1) tile transpose both arrays: (1024,128) as 8 tiles of (128,128)
def k_transpose(k_ref, p_ref, ok, op):
    k = k_ref[:].reshape(8, 128, 128)
    p = p_ref[:].reshape(8, 128, 128)
    ok[:] = jnp.swapaxes(k, 1, 2).reshape(W, LANES)
    op[:] = jnp.swapaxes(p, 1, 2).reshape(W, LANES)
run_kernel("tile-transpose x2 arrays", k_transpose)


# 2) transpose there AND back (round trip)
def k_transpose2(k_ref, p_ref, ok, op):
    k = k_ref[:].reshape(8, 128, 128)
    p = p_ref[:].reshape(8, 128, 128)
    kt = jnp.swapaxes(k, 1, 2)
    pt = jnp.swapaxes(p, 1, 2)
    ok[:] = jnp.swapaxes(kt + 1, 1, 2).reshape(W, LANES)
    op[:] = jnp.swapaxes(pt + 1, 1, 2).reshape(W, LANES)
run_kernel("tile-transpose round-trip x2", k_transpose2)


# 3) one lane-gather stage (XOR 64) via take_along_axis: current approach
def k_lane_gather(k_ref, p_ref, ok, op):
    k, p = k_ref[:], p_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    pk = jnp.take_along_axis(k, lane ^ 64, axis=1)
    pp = jnp.take_along_axis(p, lane ^ 64, axis=1)
    upper = (lane & 64) != 0
    take = (upper ^ (pk < k)) & (pk != k)
    ok[:] = jnp.where(take, pk, k)
    op[:] = jnp.where(take, pp, p)
run_kernel("1 lane stage (gather, j=64)", k_lane_gather)


# 4) one lane stage via roll-pair (single-bit XOR)
def k_lane_roll(k_ref, p_ref, ok, op):
    k, p = k_ref[:], p_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    j = 64
    def xr(x):
        r_minus = pltpu.roll(x, j, axis=1)
        r_plus = pltpu.roll(x, LANES - j, axis=1)
        return jnp.where((lane & j) == 0, r_plus, r_minus)
    pk, pp = xr(k), xr(p)
    upper = (lane & j) != 0
    take = (upper ^ (pk < k)) & (pk != k)
    ok[:] = jnp.where(take, pk, k)
    op[:] = jnp.where(take, pp, p)
run_kernel("1 lane stage (roll-pair, j=64)", k_lane_roll)


# 5) chain of 7 lane stages (j=64..1) via gather
def k_lane_chain_gather(k_ref, p_ref, ok, op):
    k, p = k_ref[:], p_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    for j in (64, 32, 16, 8, 4, 2, 1):
        pk = jnp.take_along_axis(k, lane ^ j, axis=1)
        pp = jnp.take_along_axis(p, lane ^ j, axis=1)
        upper = (lane & j) != 0
        take = (upper ^ (pk < k)) & (pk != k)
        k = jnp.where(take, pk, k)
        p = jnp.where(take, pp, p)
    ok[:] = k
    op[:] = p
run_kernel("7 lane stages (gather)", k_lane_chain_gather)


# 6) chain of 7 lane stages via roll-pairs
def k_lane_chain_roll(k_ref, p_ref, ok, op):
    k, p = k_ref[:], p_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    for j in (64, 32, 16, 8, 4, 2, 1):
        def xr(x, j=j):
            r_minus = pltpu.roll(x, j, axis=1)
            r_plus = pltpu.roll(x, LANES - j, axis=1)
            return jnp.where((lane & j) == 0, r_plus, r_minus)
        pk, pp = xr(k), xr(p)
        upper = (lane & j) != 0
        take = (upper ^ (pk < k)) & (pk != k)
        k = jnp.where(take, pk, k)
        p = jnp.where(take, pp, p)
    ok[:] = k
    op[:] = p
run_kernel("7 lane stages (roll-pair)", k_lane_chain_roll)


# 7) equivalent work in T layout: transpose in, 7 row-stride stages
#    (strides 64..8 static slices, 4..1 rolls), transpose out
def k_T_stages(k_ref, p_ref, ok, op):
    k = jnp.swapaxes(k_ref[:].reshape(8, 128, 128), 1, 2).reshape(W, LANES)
    p = jnp.swapaxes(p_ref[:].reshape(8, 128, 128), 1, 2).reshape(W, LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
    # strides 64..8 as static slices within each 128-row tile
    for jr in (64, 32, 16, 8):
        outs_k, outs_p = [], []
        for c0 in range(0, W, 2 * jr):
            ak, bk = k[c0:c0 + jr], k[c0 + jr:c0 + 2 * jr]
            ap, bp = p[c0:c0 + jr], p[c0 + jr:c0 + 2 * jr]
            lo = jnp.minimum(ak, bk)
            hi = jnp.maximum(ak, bk)
            outs_k += [lo, hi]
            outs_p += [jnp.where(lo != ak, bp, ap), jnp.where(hi != bk, ap, bp)]
        k = jnp.concatenate(outs_k, axis=0)
        p = jnp.concatenate(outs_p, axis=0)
    # strides 4..1 as sublane rolls
    for jr in (4, 2, 1):
        r_minus_k = pltpu.roll(k, jr, axis=0)
        r_plus_k = pltpu.roll(k, W - jr, axis=0)
        pk = jnp.where((row & jr) == 0, r_plus_k, r_minus_k)
        r_minus_p = pltpu.roll(p, jr, axis=0)
        r_plus_p = pltpu.roll(p, W - jr, axis=0)
        pp = jnp.where((row & jr) == 0, r_plus_p, r_minus_p)
        upper = (row & jr) != 0
        take = (upper ^ (pk < k)) & (pk != k)
        k = jnp.where(take, pk, k)
        p = jnp.where(take, pp, p)
    ok[:] = jnp.swapaxes(k.reshape(8, 128, 128), 1, 2).reshape(W, LANES)
    op[:] = jnp.swapaxes(p.reshape(8, 128, 128), 1, 2).reshape(W, LANES)
run_kernel("T-layout: trans + 4 slices + 3 rolls + trans", k_T_stages)


# 8) 7 static-slice stages (strides >=8 rows) for reference
def k_slices(k_ref, p_ref, ok, op):
    k, p = k_ref[:], p_ref[:]
    for jr in (512, 256, 128, 64, 32, 16, 8):
        outs_k, outs_p = [], []
        for c0 in range(0, W, 2 * jr):
            ak, bk = k[c0:c0 + jr], k[c0 + jr:c0 + 2 * jr]
            ap, bp = p[c0:c0 + jr], p[c0 + jr:c0 + 2 * jr]
            lo = jnp.minimum(ak, bk)
            hi = jnp.maximum(ak, bk)
            outs_k += [lo, hi]
            outs_p += [jnp.where(lo != ak, bp, ap), jnp.where(hi != bk, ap, bp)]
        k = jnp.concatenate(outs_k, axis=0)
        p = jnp.concatenate(outs_p, axis=0)
    ok[:] = k
    op[:] = p
run_kernel("7 slice stages (rows 512..8)", k_slices)
