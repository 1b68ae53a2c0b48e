"""Full-kernel A/B: current rho3 kernels vs hybrid-layout variants."""
import os, time
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from aqp_tpu.ops.pallas import rho3
from aqp_tpu.ops.pallas.rho3 import Rho3Params, _fine_bucket
from aqp_tpu.ops.pallas.netsort import (
    LANES, KEY_PAD_INT, KEY_PAD_LOW, sort_pairs, sort_pairs_hybrid,
    merge_runs, merge_runs_hybrid, propagate_last_r)
from aqp_tpu.utils.timing import hard_sync

prm = Rho3Params()
W = prm.block_rows
NB = 512
gmax = prm.f1 * prm.f2
nbg = NB // prm.group

key = jax.random.PRNGKey(0)
kw = jax.random.randint(key, (NB * W, LANES), 0, 1 << 30, jnp.int32) << 1
pw = jax.random.randint(jax.random.PRNGKey(1), (NB * W, LANES), 0, 1 << 30,
                        jnp.int32)
scale = jnp.float32(gmax / (1 << 30) * (1.0 - 1e-6)).reshape(1)
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


def extract_slots_v2(k, p, k_scr, p_scr, loc_of, nslots, slot_rows, out_k,
                     out_p, ovf_ref, block_rows, prefix):
    """Extraction with vectorized boundary precompute (no per-slot
    reductions): histogram of b_lead over slot ids -> cumsum -> row0 per
    slot as static picks from a small vector."""
    k_scr[:] = k
    p_scr[:] = p
    lead = k[:, :1]
    b_lead = loc_of(lead)                      # (rows,1), in [-1, nslots]
    f_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nslots), 1)
    c_lt = jnp.sum((b_lead < f_iota).astype(jnp.int32), axis=0)   # (nslots,)
    e_f = jnp.sum((b_lead <= f_iota).astype(jnp.int32), axis=0)
    row0_v = jnp.clip(c_lt - 1, 0, block_rows - slot_rows)
    ovf_ref[0, 0] += jnp.sum(jnp.maximum(e_f - row0_v - slot_rows, 0),
                             dtype=jnp.int32)
    for f in range(nslots):
        row0 = row0_v[f]
        sk = k_scr[pl.ds(row0, slot_rows), :]
        sp = p_scr[pl.ds(row0, slot_rows), :]
        loc = loc_of(sk)
        out_k[prefix + (f,)] = jnp.where(
            loc == f, sk, jnp.where(loc < f, KEY_PAD_LOW, KEY_PAD_INT))
        out_p[prefix + (f,)] = jnp.where(loc == f, sp, 0)


def make_k1(variant):
    def kernel(scale_ref, k_ref, p_ref, ok_ref, op_ref, ovf_ref,
               k_scr, p_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            ovf_ref[0, 0] = jnp.int32(0)
        sc = scale_ref[0]
        if variant == "v0":
            k, p = sort_pairs(k_ref[:], p_ref[:], use_gather=True)
        else:
            k, p = sort_pairs_hybrid(k_ref[:], p_ref[:])
        def loc_of(x):
            return _fine_bucket(x, sc, gmax) // prm.f2
        if variant == "v2":
            extract_slots_v2(k, p, k_scr, p_scr, loc_of, prm.f1,
                             prm.slot_rows, ok_ref, op_ref, ovf_ref, W, (0,))
        else:
            rho3._extract_slots(k, p, k_scr, p_scr, loc_of, prm.f1,
                                prm.slot_rows, ok_ref, op_ref, ovf_ref, W,
                                (0,))
    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=[pl.BlockSpec((W, LANES), lambda i, s: (i, 0))] * 2,
        out_specs=[
            pl.BlockSpec((1, prm.f1, prm.slot_rows, LANES),
                         lambda i, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, prm.f1, prm.slot_rows, LANES),
                         lambda i, s: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((W, LANES), jnp.int32)] * 2,
    )
    return jax.jit(lambda s_, a, b: pl.pallas_call(
        kernel, grid_spec=grid1,
        out_shape=[
            jax.ShapeDtypeStruct((NB, prm.f1, prm.slot_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((NB, prm.f1, prm.slot_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ])(s_, a, b))


out0 = bench("K1 v0 (current)", make_k1("v0"), scale, kw, pw)
out1 = bench("K1 v1 (hybrid sort)", make_k1("v1"), scale, kw, pw)
out2 = bench("K1 v2 (hybrid + vec-extract)", make_k1("v2"), scale, kw, pw)

import numpy as np
for name, o in (("v1", out1), ("v2", out2)):
    same_k = bool(jnp.array_equal(out0[0], o[0]))
    same_p = bool(jnp.array_equal(out0[1], o[1]))
    same_o = bool(jnp.array_equal(out0[2], o[2]))
    print(f"K1 {name} output equal to v0: k={same_k} p={same_p} ovf={same_o}",
          flush=True)

k1, p1 = out2[0], out2[1]


# ---- K2 variants
def make_k2(variant):
    def kernel(scale_ref, k_ref, p_ref, ok_ref, op_ref, ovf_ref,
               k_scr, p_scr):
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            ovf_ref[0, 0] = jnp.int32(0)
        sc = scale_ref[0]
        f1_idx = pl.program_id(0)
        k = k_ref[:].reshape(W, LANES)
        p = p_ref[:].reshape(W, LANES)
        if variant == "v0":
            k, p = merge_runs(k, p, prm.slot_rows, use_gather=True)
        else:
            k, p = merge_runs_hybrid(k, p, prm.slot_rows)
        def loc_of(x):
            g = _fine_bucket(x, sc, gmax)
            loc = g - f1_idx * prm.f2
            return jnp.where(g >= gmax, prm.f2,
                             jnp.where(g < 0, -1, jnp.clip(loc, -1, prm.f2)))
        if variant == "v2":
            extract_slots_v2(k, p, k_scr, p_scr, loc_of, prm.f2,
                             prm.kd_slot_rows, ok_ref, op_ref, ovf_ref, W,
                             (0, 0))
        else:
            rho3._extract_slots(k, p, k_scr, p_scr, loc_of, prm.f2,
                                prm.kd_slot_rows, ok_ref, op_ref, ovf_ref, W,
                                (0, 0))
    grid2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(prm.f1, nbg),
        in_specs=[pl.BlockSpec((prm.group, 1, prm.slot_rows, LANES),
                               lambda f, g, s: (g, f, 0, 0))] * 2,
        out_specs=[
            pl.BlockSpec((1, 1, prm.f2, prm.kd_slot_rows, LANES),
                         lambda f, g, s: (f, g, 0, 0, 0)),
            pl.BlockSpec((1, 1, prm.f2, prm.kd_slot_rows, LANES),
                         lambda f, g, s: (f, g, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((W, LANES), jnp.int32)] * 2,
    )
    return jax.jit(lambda s_, a, b: pl.pallas_call(
        kernel, grid_spec=grid2,
        out_shape=[
            jax.ShapeDtypeStruct((prm.f1, nbg, prm.f2, prm.kd_slot_rows,
                                  LANES), jnp.int32),
            jax.ShapeDtypeStruct((prm.f1, nbg, prm.f2, prm.kd_slot_rows,
                                  LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ])(s_, a, b))


o2v0 = bench("K2 v0 (current)", make_k2("v0"), scale, k1, p1)
o2v2 = bench("K2 v2 (hybrid + vec-extract)", make_k2("v2"), scale, k1, p1)
print("K2 v2 equal:",
      bool(jnp.array_equal(o2v0[0], o2v2[0])),
      bool(jnp.array_equal(o2v0[1], o2v2[1])),
      bool(jnp.array_equal(o2v0[2], o2v2[2])), flush=True)
k2o, p2o = o2v2[0], o2v2[1]


# ---- K3 variants
def make_k3(variant):
    w3 = nbg * prm.kd_slot_rows
    def kernel(k_ref, p_ref, m_ref, c_ref):
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            m_ref[0, 0] = jnp.int32(0)
            c_ref[0, 0] = jnp.int32(0)
        k = k_ref[:].reshape(w3, LANES)
        p = p_ref[:].reshape(w3, LANES)
        if variant == "v0":
            k, p = merge_runs(k, p, prm.kd_slot_rows, use_gather=True)
        else:
            k, p = merge_runs_hybrid(k, p, prm.kd_slot_rows)
        ck, cp = propagate_last_r(k, p)
        match = ((k & 1) == 1) & (k != KEY_PAD_INT) & (ck == k - 1)
        m_ref[0, 0] += jnp.sum(match, dtype=jnp.int32)
        c_ref[0, 0] += jnp.sum(jnp.where(match, cp + p, 0), dtype=jnp.int32)
    return jax.jit(lambda a, b: pl.pallas_call(
        kernel, grid=(prm.f1, prm.f2),
        in_specs=[pl.BlockSpec((1, nbg, 1, prm.kd_slot_rows, LANES),
                               lambda x, y: (x, 0, y, 0, 0))] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.int32)] * 2)(a, b))


o3v0 = bench("K3 v0 (current)", make_k3("v0"), k2o, p2o)
o3v1 = bench("K3 v1 (hybrid merge)", make_k3("v1"), k2o, p2o)
print("K3 v1 equal:", bool(jnp.array_equal(o3v0[0], o3v1[0])),
      bool(jnp.array_equal(o3v0[1], o3v1[1])), flush=True)
