"""Round-2b: per-kernel timing of the rho3 fused pipeline at headline scale.

Times cumulative prefixes (pack-only, K1, K1+K2, full count, materialize)
as separate jitted programs, best-of-N with dispatch overhead subtracted.
"""
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from aqp_tpu.data import create_relation_pk, create_relation_fk
from aqp_tpu.ops.pallas import rho3 as R
from aqp_tpu.ops.pallas.rho3 import (
    Rho3Params, HASH_C, HASH_MASK, KEY_PAD_INT, LANES, _make_k1, _make_k2,
    _make_k3, _next_pow2, _partition_2level,
)

NR, NS = 13_107_200, 52_428_800
relR = create_relation_pk(NR, seed=11111)
relS = create_relation_fk(NS, NR, seed=22222)
rk, rp, sk, sp = relR.key, relR.payload, relS.key, relS.payload
jax.block_until_ready((rk, sk))

prm = Rho3Params()


def overhead():
    tiny = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: jnp.sum(x))
    int(f(tiny))
    t0 = time.perf_counter()
    for _ in range(5):
        int(f(tiny))
    return (time.perf_counter() - t0) / 5


OH = overhead()
print(f"overhead: {OH*1e3:.1f} ms", flush=True)


def timeit(name, f, *args, reps=6):
    r = f(*args)
    jax.block_until_ready(r)
    # force scalar fetch
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        jnp.asarray(r).block_until_ready()
        float(jnp.asarray(r).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {max(best - OH, 0)*1e3:.1f} ms", flush=True)


@jax.jit
def pack_only(rk, rp, sk, sp):
    cmul = jnp.int32(HASH_C)
    sig = jnp.concatenate([rk * cmul, sk * cmul]) & HASH_MASK
    tag = jnp.concatenate([jnp.zeros_like(rk), jnp.ones_like(sk)])
    packed = (sig << 1) | tag
    pay = jnp.concatenate([rp, sp])
    return jnp.sum(packed[::65536], dtype=jnp.int32) + pay[0]


def k1_only_f(prm):
    @jax.jit
    def f(rk, rp, sk, sp):
        cmul = jnp.int32(HASH_C)
        sig = jnp.concatenate([rk * cmul, sk * cmul]) & HASH_MASK
        tag = jnp.concatenate([jnp.zeros_like(rk), jnp.ones_like(sk)])
        packed = (sig << 1) | tag
        pay = jnp.concatenate([rp, sp])
        n = packed.shape[0]
        block = prm.block_rows * LANES
        nb = _next_pow2(max(-(-n // block), prm.group))
        padn = nb * block - n
        if padn:
            packed = jnp.concatenate(
                [packed, jnp.full((padn,), KEY_PAD_INT, jnp.int32)])
            pay = jnp.concatenate([pay, jnp.zeros((padn,), jnp.int32)])
        gmax = prm.f1 * prm.f2
        scale = jnp.float32(gmax / (1 << 30) * (1.0 - 1e-6))
        kw = packed.reshape(nb * prm.block_rows, LANES)
        pw = pay.reshape(nb * prm.block_rows, LANES)
        grid1 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,),
            in_specs=[pl.BlockSpec((prm.block_rows, LANES),
                                   lambda i, s: (i, 0))] * 2,
            out_specs=[
                pl.BlockSpec((1, prm.f1, prm.slot_rows, LANES),
                             lambda i, s: (i, 0, 0, 0)),
                pl.BlockSpec((1, prm.f1, prm.slot_rows, LANES),
                             lambda i, s: (i, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ])
        k1, p1, ovf1 = pl.pallas_call(
            _make_k1(prm, gmax, True), grid_spec=grid1,
            out_shape=[
                jax.ShapeDtypeStruct((nb, prm.f1, prm.slot_rows, LANES),
                                     jnp.int32),
                jax.ShapeDtypeStruct((nb, prm.f1, prm.slot_rows, LANES),
                                     jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ])(scale.reshape(1), kw, pw)
        return ovf1[0, 0] + k1[0, 0, 0, 0]
    return f


def k12_f(prm):
    @jax.jit
    def f(rk, rp, sk, sp):
        k2, p2, nbg, ovf, alias = _partition_2level(
            rk, rp, sk, sp, prm, HASH_C, False)
        return ovf + k2[0, 0, 0, 0, 0]
    return f


def full_f(prm):
    @functools.partial(jax.jit)
    def f(rk, rp, sk, sp):
        m, c, o = R.rho_join_count_v3(rk, rp, sk, sp, prm=prm)
        return m
    return f


timeit("pack_only", pack_only, rk, rp, sk, sp)
timeit("K1", k1_only_f(prm), rk, rp, sk, sp)
timeit("K1+K2", k12_f(prm), rk, rp, sk, sp)
timeit("full count", full_f(prm), rk, rp, sk, sp)


@jax.jit
def mat_f(rk, rp, sk, sp):
    m, c, ok, orp, osp, o = R.rho_join_materialize_v3(rk, rp, sk, sp)
    return m


timeit("materialize", mat_f, rk, rp, sk, sp)
