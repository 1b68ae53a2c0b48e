"""No-partition hash join (PHT/NPO family) as a build/probe Pallas pipeline.

Reference: no_partitioning_hash_join.cpp:165-539 — ONE shared bucket-chained
hash table over R, built in parallel by all threads, then probed by all
threads (HashLinkTableCommon.cpp:110-140).  The defining structure (vs the
radix family) is the persistent shared table and the build/probe split: the
table is built once and probed as a stream, with the CPU cache hierarchy
absorbing the random accesses.

TPU-native design (not a translation): the VPU has no random access, so the
"shared table in cache" becomes a HASH-ORDERED TABLE in HBM whose regions
fit VMEM (VMEM = the cache the reference's table lives in):

  build  K1+K2 route R's packed keys sigma(key)<<1|0 through the fixed-slot
         network (ops/pallas/rho3.py machinery) into the table: fine slots
         (f1, nbg_r, f2, kd, LANES) — a persistent artifact, reusable
         across probes (the reference's preloaded table, ecall analog).
  probe  K1+K2 route S the same way (same salt — same hash function), then
         K3TWO: for each (f1, f2) table region, DMA the table slice and the
         S slice (both static blockspec index maps), merge each side's
         sorted runs, and resolve membership with the displacement
         propagate over the combined window — every S element finds the
         R element "stored at its hash neighborhood", the vectorized form
         of the bucket-chain walk.

Exact for unique R keys (every reference PHT workload: PK build sides);
slot overflow / pad aliasing is COUNTED and reported — callers re-salt or
fall back to the exact XLA core, never a silent wrong answer.

Variant geometry (the reference's build variants are compile-time knobs,
no_partitioning_hash_join.cpp:280-345):
  PHT/NPO_st   defaults (f1=36, f2=16)
  PHT_no/NPO_no  f1=32 — lower per-slot load: the no-overflow-bucket table
  PHT_un       f2=32, kd=32 — finer fan-out per pass (unroll analog)
  PHT_o        f2=8, kd=128 — coarser buckets, longer in-region "chains"
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqp_tpu.ops.pallas.netsort import (
    KEY_PAD_INT,
    LANES,
    merge_runs,
    merge_runs_hybrid,
    propagate_last_r_key,
    propagate_last_r_split,
)
from aqp_tpu.ops.pallas.rho3 import (
    HASH_C,
    HASH_MASK,
    Rho3Params,
    _modinv_pow2,
    pack_keys,
    route_2level,
)

# geometry per algorithm variant (see module docstring)
VARIANT_PARAMS = {
    "PHT": Rho3Params(),
    "NPO_st": Rho3Params(),
    # no-overflow variant: MORE buckets -> lower per-slot load (mean
    # 131072/48 = 2731 in a 4096 slot = 26 sigma of margin; f1=32 would
    # put the mean AT capacity and overflow structurally)
    "PHT_no": Rho3Params(f1=48),
    "NPO_no": Rho3Params(f1=48),
    "PHT_un": Rho3Params(f2=32, kd_slot_rows=32),
    "PHT_o": Rho3Params(f2=8, kd_slot_rows=128),
}


def _make_pipeline(prm):
    def pipe(rk, rp, sk, sp, salt, with_checksum):
        return nphj_join_count(rk, rp, sk, sp, prm=prm, salt=salt,
                               with_checksum=with_checksum)
    return pipe


# stable per-variant residual-pipeline callables for the skew tier
# (joins/skewtier.skew_fused_count takes the pipeline as a jit-static arg;
# module-level identity keeps the jit cache warm across calls)
VARIANT_PIPELINES = {k: _make_pipeline(v) for k, v in VARIANT_PARAMS.items()}

# Skew-residual geometry: kd_slot_rows=128 doubles the fine-slot slack so
# the post-split Zipf TAIL fits (the per-key overflow threshold scales
# with the slack x window count; see joins/skewtier._skew_prm) — PHT
# keeps its build/probe identity under skew at the wider geometry.
import dataclasses as _dc  # noqa: E402

VARIANT_PIPELINES_SKEW = {
    k: _make_pipeline(_dc.replace(v, kd_slot_rows=128))
    for k, v in VARIANT_PARAMS.items()
}


def _merge(k, p, run_rows, use_gather):
    if k.shape[0] % LANES == 0:
        return merge_runs_hybrid(k, p, run_rows, use_gather=use_gather)
    return merge_runs(k, p, run_rows, use_gather=use_gather)


def _assemble(tk_ref, tp_ref, sk_ref, sp_ref, prm, wr, ws, use_gather,
              with_payload):
    """Merge each side's runs, pad the shorter to the longer, and return the
    combined sorted-pair window (2*max(wr, ws) rows)."""
    kt = tk_ref[:].reshape(wr, LANES)
    pt = tp_ref[:].reshape(wr, LANES) if with_payload else None
    kt, pt = _merge(kt, pt, prm.kd_slot_rows, use_gather)
    ks = sk_ref[:].reshape(ws, LANES)
    ps = sp_ref[:].reshape(ws, LANES) if with_payload else None
    ks, ps = _merge(ks, ps, prm.kd_slot_rows, use_gather)
    wm = max(wr, ws)

    def padto(x, fill):
        d = wm - x.shape[0]
        if d == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((d, LANES), fill, jnp.int32)], axis=0)

    k = jnp.concatenate([padto(kt, KEY_PAD_INT), padto(ks, KEY_PAD_INT)],
                        axis=0)
    if with_payload:
        p = jnp.concatenate([padto(pt, 0), padto(ps, 0)], axis=0)
    else:
        p = None
    # two sorted runs of wm rows -> one sorted window (single merge box)
    return _merge(k, p, wm, use_gather)


def _make_k3two(prm: Rho3Params, nbg_r: int, nbg_s: int, use_gather: bool,
                with_payload: bool):
    """Count kernel: table region + S region -> (matches, checksum)."""
    wr = nbg_r * prm.kd_slot_rows
    ws = nbg_s * prm.kd_slot_rows

    def kernel(*refs):
        if with_payload:
            tk, tp, sk_, sp_, m_ref, c_ref = refs
        else:
            tk, sk_, m_ref, c_ref = refs
            tp = sp_ = None

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            m_ref[0, 0] = jnp.int32(0)
            c_ref[0, 0] = jnp.int32(0)

        k, p = _assemble(tk, tp, sk_, sp_, prm, wr, ws, use_gather,
                         with_payload)
        if with_payload:
            ck, cp = propagate_last_r_split(k, p)
            match = ((k & 1) == 1) & (k != KEY_PAD_INT) & (ck == k - 1)
            m_ref[0, 0] += jnp.sum(match, dtype=jnp.int32)
            c_ref[0, 0] += jnp.sum(
                jnp.where(match, cp + p, 0), dtype=jnp.int32)
        else:
            ck = propagate_last_r_key(k)
            match = ((k & 1) == 1) & (k != KEY_PAD_INT) & (ck == k - 1)
            m_ref[0, 0] += jnp.sum(match, dtype=jnp.int32)

    return kernel


def _make_k3two_mat(prm: Rho3Params, nbg_r: int, nbg_s: int,
                    use_gather: bool):
    """Materializing kernel: region-chunked output columns with sentinel
    holes (key -3) — the chunked-table contract of rho3.K3M."""
    wr = nbg_r * prm.kd_slot_rows
    ws = nbg_s * prm.kd_slot_rows
    w = 2 * max(wr, ws)

    def kernel(inv_ref, tk, tp, sk_, sp_, ok_ref, orp_ref, osp_ref,
               m_ref, c_ref):
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            m_ref[0, 0] = jnp.int32(0)
            c_ref[0, 0] = jnp.int32(0)

        k, p = _assemble(tk, tp, sk_, sp_, prm, wr, ws, use_gather, True)
        ck, cp = propagate_last_r_split(k, p)
        match = ((k & 1) == 1) & (k != KEY_PAD_INT) & (ck == k - 1)
        m_ref[0, 0] += jnp.sum(match, dtype=jnp.int32)
        c_ref[0, 0] += jnp.sum(jnp.where(match, cp + p, 0), dtype=jnp.int32)
        okey = (((k >> 1) * inv_ref[0, 0]) & HASH_MASK)
        ok_ref[0, 0] = jnp.where(match, okey, -3).reshape(ok_ref.shape[2:])
        orp_ref[0, 0] = jnp.where(match, cp, 0).reshape(orp_ref.shape[2:])
        osp_ref[0, 0] = jnp.where(match, p, 0).reshape(osp_ref.shape[2:])

    return kernel


@functools.partial(jax.jit, static_argnames=("prm", "interpret",
                                             "with_payload"))
def nphj_build(rk, rp, prm: Rho3Params = Rho3Params(), salt: int = HASH_C,
               interpret: bool = False, with_payload: bool = True):
    """Build the shared hash-ordered table over R.

    Returns (tk2, tp2, overflow): fine slots (f1, nbg_r, f2, kd, LANES) —
    the persistent table artifact (probe-many supported, preload analog
    secure_joins.cpp:34-49).  tp2 is None when with_payload=False."""
    packed, alias = pack_keys(rk, jnp.zeros_like(rk), salt)
    tk2, tp2, _, ovf = route_2level(packed, rp if with_payload else None,
                                    prm, interpret, with_payload)
    return tk2, tp2, ovf + alias


@functools.partial(jax.jit, static_argnames=("prm", "interpret",
                                             "with_checksum"))
def nphj_probe(tk2, tp2, t_ovf, sk, sp, prm: Rho3Params = Rho3Params(),
               salt: int = HASH_C, interpret: bool = False,
               with_checksum: bool = True):
    """Probe the table with S.  Returns (matches, checksum, overflow)."""
    use_gather = not interpret
    packed, alias = pack_keys(sk, jnp.ones_like(sk), salt)
    sk2, sp2, nbg_s, ovf_s = route_2level(
        packed, sp if with_checksum else None, prm, interpret, with_checksum)
    nbg_r = tk2.shape[1]
    narr = 2 if with_checksum else 1

    def spec(nbg):
        return pl.BlockSpec((1, nbg, 1, prm.kd_slot_rows, LANES),
                            lambda a, b: (a, 0, b, 0, 0))

    ins = ([tk2, tp2] if with_checksum else [tk2]) + (
        [sk2, sp2] if with_checksum else [sk2])
    m, c = pl.pallas_call(
        _make_k3two(prm, nbg_r, nbg_s, use_gather, with_checksum),
        grid=(prm.f1, prm.f2),
        in_specs=[spec(nbg_r)] * narr + [spec(nbg_s)] * narr,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(*ins)
    return (m[0, 0], c[0, 0].astype(jnp.uint32), t_ovf + ovf_s + alias)


@functools.partial(jax.jit, static_argnames=("prm", "interpret",
                                             "with_checksum"))
def nphj_join_count(rk, rp, sk, sp, prm: Rho3Params = Rho3Params(),
                    salt: int = HASH_C, interpret: bool = False,
                    with_checksum: bool = True):
    """Fused build+probe count join (one program — the serving path).
    Returns (matches, checksum, overflow)."""
    tk2, tp2, bovf = nphj_build(rk, rp, prm, salt, interpret,
                                with_payload=with_checksum)
    return nphj_probe(tk2, tp2, bovf, sk, sp, prm, salt, interpret,
                      with_checksum)


@functools.partial(jax.jit, static_argnames=("prm", "interpret"))
def nphj_join_materialize(rk, rp, sk, sp, prm: Rho3Params = Rho3Params(),
                          salt: int = HASH_C, interpret: bool = False):
    """Fused build+probe materializing join: region-chunked output columns
    with sentinel holes (key -3).  Returns
    (matches, checksum, key, r_payload, s_payload, overflow)."""
    use_gather = not interpret
    tk2, tp2, bovf = nphj_build(rk, rp, prm, salt, interpret)
    packed, alias = pack_keys(sk, jnp.ones_like(sk), salt)
    sk2, sp2, nbg_s, ovf_s = route_2level(packed, sp, prm, interpret, True)
    nbg_r = tk2.shape[1]
    w = 2 * max(nbg_r, nbg_s) * prm.kd_slot_rows
    inv = _modinv_pow2(jnp.int32(salt)).reshape(1, 1)

    def spec(nbg):
        return pl.BlockSpec((1, nbg, 1, prm.kd_slot_rows, LANES),
                            lambda a, b: (a, 0, b, 0, 0))

    col = pl.BlockSpec((1, 1, w, LANES), lambda a, b: (a, b, 0, 0))
    col_shape = jax.ShapeDtypeStruct((prm.f1, prm.f2, w, LANES), jnp.int32)
    ok, orp, osp, m, c = pl.pallas_call(
        _make_k3two_mat(prm, nbg_r, nbg_s, use_gather),
        grid=(prm.f1, prm.f2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [spec(nbg_r)] * 2 + [spec(nbg_s)] * 2,
        out_specs=[col, col, col,
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[col_shape, col_shape, col_shape,
                   jax.ShapeDtypeStruct((1, 1), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        interpret=interpret,
    )(inv, tk2, tp2, sk2, sp2)
    return (m[0, 0], c[0, 0].astype(jnp.uint32),
            ok.reshape(-1), orp.reshape(-1), osp.reshape(-1),
            bovf + ovf_s + alias)
