"""Probe: MXU one-hot row-gather as slot extraction + small-box layouts."""
import os, time
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from aqp_tpu.ops.pallas.netsort import (
    LANES, _iotas, stage, sort_pairs_hybrid, run_network_hybrid,
    _net_schedule)
from aqp_tpu.utils.timing import hard_sync

W, NB = 1024, 512
F1, SLOT = 36, 32

key = jax.random.PRNGKey(0)
kw = jax.random.randint(key, (NB * W, LANES), 0, 1 << 30, jnp.int32)
pw = jax.random.randint(jax.random.PRNGKey(1), (NB * W, LANES), 0, 1 << 30,
                        jnp.int32)
jax.block_until_ready((kw, pw))
REP = 4


def bench(name, call, *args):
    out = call(*args)
    hard_sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REP):
            out = call(*args)
        hard_sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/REP*1e3:.2f} ms/call", flush=True)
    return out


def run2(kern, out_rows=W, n_out=2, scratch=False):
    kwargs = {}
    if scratch:
        kwargs["scratch_shapes"] = [pltpu.VMEM((W, LANES), jnp.int32)] * 2
    return jax.jit(lambda a, b: pl.pallas_call(
        kern, grid=(NB,),
        in_specs=[pl.BlockSpec((W, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((out_rows, LANES), lambda i: (i, 0))] * n_out,
        out_shape=[jax.ShapeDtypeStruct((NB * out_rows, LANES), jnp.int32)]
        * n_out,
        **kwargs,
    )(a, b))


# A) MXU one-hot row-gather: out[o] = in[src[o]] for 1152 out rows
OUT_ROWS = F1 * SLOT  # 1152


def k_mxu_gather(k_ref, p_ref, ok, op):
    k, p = k_ref[:], p_ref[:]
    # fake dynamic source rows: src[o] = (o * 7 + (k[0,0]&7)) % W
    o_i = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, W), 0)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, W), 1)
    src = (o_i * 7 + (k[0, 0] & 7)) % W
    P = (src == s_i).astype(jnp.bfloat16)

    def gather(x):
        planes = [((x >> (8 * i)) & 0xFF).astype(jnp.bfloat16)
                  for i in range(4)]
        xp = jnp.concatenate(planes, axis=1)  # (W, 512)
        yp = jax.lax.dot_general(
            P, xp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = yp.astype(jnp.int32)
        return (y[:, 0:128] | (y[:, 128:256] << 8) | (y[:, 256:384] << 16)
                | (y[:, 384:512] << 24))

    ok[:] = gather(k)
    op[:] = gather(p)


bench("A MXU one-hot row-gather (1152 rows x2)", run2(k_mxu_gather, OUT_ROWS), kw, pw)


# B) same but int8 matmul
def k_mxu_gather_i8(k_ref, p_ref, ok, op):
    k, p = k_ref[:], p_ref[:]
    o_i = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, W), 0)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, W), 1)
    src = (o_i * 7 + (k[0, 0] & 7)) % W
    P = (src == s_i).astype(jnp.int8)

    def gather(x):
        planes = [((x >> (8 * i)) & 0xFF).astype(jnp.int8) for i in range(4)]
        xp = jnp.concatenate(planes, axis=1)
        y = jax.lax.dot_general(
            P, xp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return ((y[:, 0:128] & 0xFF) | ((y[:, 128:256] & 0xFF) << 8)
                | ((y[:, 256:384] & 0xFF) << 16) | (y[:, 384:512] << 24))

    ok[:] = gather(k)
    op[:] = gather(p)


bench("B MXU int8 row-gather (1152 rows x2)", run2(k_mxu_gather_i8, OUT_ROWS), kw, pw)


# C) small boxes 2..1024 in pure T layout (no transposes: treat input as T)
def k_small_T(k_ref, p_ref, ok, op):
    k, p = run_network_hybrid(k_ref[:], p_ref[:],
                              _net_schedule(1024, 2), "T", "T")
    ok[:] = k
    op[:] = p


bench("C boxes 2..1024 pure-T (55 stages)", run2(k_small_T), kw, pw)


# D) 28 consecutive lane stages (boxes 2..128 N layout)
def k_lane28(k_ref, p_ref, ok, op):
    k, p = k_ref[:], p_ref[:]
    lane, row = _iotas(k.shape)
    box = 2
    while box <= 128:
        j = box // 2
        while j >= 1:
            k, p = stage(k, p, j, box, lane, row, True)
            j //= 2
        box *= 2
    ok[:] = k
    op[:] = p


bench("D boxes 2..128 pure lane chain (28 stages)", run2(k_lane28), kw, pw)


# E) boxes 2..128 in T (28 stages of rolls+slices)
def k_small_T128(k_ref, p_ref, ok, op):
    k, p = run_network_hybrid(k_ref[:], p_ref[:],
                              _net_schedule(128, 2), "T", "T")
    ok[:] = k
    op[:] = p


bench("E boxes 2..128 pure-T (28 stages)", run2(k_small_T128), kw, pw)
