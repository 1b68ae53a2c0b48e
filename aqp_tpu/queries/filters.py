"""Per-query predicate filters (SIMD filter-kernel equivalents).

Reference: lib/TPCH-Queries/src/filters.hpp:29-138 (thread-parallel filter
harness) + Q{3,10,12,19}Predicates.hpp (AVX-512 predicate kernels using
cmp*_mask + compressstoreu).  On TPU each filter is an elementwise predicate
producing a mask, then a stable compaction into (key, payload) relation
columns — the two-phase count/compact idiom under static shapes.

Each `q*_filter_*` returns (key[cap], payload[cap], count) with sentinel key
-3 in the invalid tail (never matches any join key).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aqp_tpu.queries import tables as T

PAD_R_SIDE = np.int32(-3)   # build-side pads
PAD_S_SIDE = np.int32(-4)   # probe-side pads (distinct: pads must never join)


def _compact_kp(mask, key, payload, pad_key=PAD_S_SIDE):
    """Stable compaction via the sort primitive (fast path on this HW).

    Full-capacity output (same length as input): filtered rows first, then
    sentinel-keyed padding.
    """
    inv = (~mask).astype(jnp.int32)
    _, k, p = jax.lax.sort((inv, key, payload), num_keys=1, is_stable=True)
    count = jnp.sum(mask, dtype=jnp.int32)
    idx = jnp.arange(k.shape[0], dtype=jnp.int32)
    live = idx < count
    return jnp.where(live, k, pad_key), jnp.where(live, p, 0), count


# --- Q3 (Q3Predicates.hpp:26-54) ---

def q3_mask_customer(c: T.CustomerTable):
    return c.mktsegment == T.MKT_BUILDING, c.key, c.rowid


@jax.jit
def q3_filter_customer(c: T.CustomerTable):
    return _compact_kp(*q3_mask_customer(c), PAD_R_SIDE)


def q3_mask_orders(o: T.OrdersTable):
    """out.key = o_custkey, out.payload = o_orderkey (the *key* field —
    Q3Predicates.hpp:41-44)."""
    return o.orderdate < T.TS_1995_03_15, o.custkey, o.key


@jax.jit
def q3_filter_orders(o: T.OrdersTable):
    return _compact_kp(*q3_mask_orders(o))


def q3_mask_lineitem(l: T.LineItemTable):
    return l.shipdate >= T.TS_1995_03_16, l.key, l.rowid


@jax.jit
def q3_filter_lineitem(l: T.LineItemTable):
    return _compact_kp(*q3_mask_lineitem(l))


# --- Q10 (Q10Predicates.hpp:27-45) ---

def q10_mask_orders(o: T.OrdersTable):
    """out.key = o_custkey, out.payload = orders rowID."""
    mask = (o.orderdate >= T.TS_1993_10_01) & (o.orderdate < T.TS_1994_01_01)
    return mask, o.custkey, o.rowid


@jax.jit
def q10_filter_orders(o: T.OrdersTable):
    return _compact_kp(*q10_mask_orders(o))


def q10_mask_lineitem(l: T.LineItemTable):
    return l.returnflag == T.L_RETURNFLAG_R, l.key, l.rowid


@jax.jit
def q10_filter_lineitem(l: T.LineItemTable):
    return _compact_kp(*q10_mask_lineitem(l))


# --- Q12 (Q12Predicates.hpp:23-32) ---

def q12_mask_lineitem(l: T.LineItemTable):
    mask = (
        ((l.shipmode == T.L_SHIPMODE_MAIL) | (l.shipmode == T.L_SHIPMODE_SHIP))
        & (l.commitdate < l.receiptdate)
        & (l.shipdate < l.commitdate)
        & (l.receiptdate >= T.TS_1994_01_01)
        & (l.receiptdate < T.TS_1995_01_01)
    )
    return mask, l.key, l.rowid


@jax.jit
def q12_filter_lineitem(l: T.LineItemTable):
    return _compact_kp(*q12_mask_lineitem(l))


# --- Q19 (Q19Predicates.hpp:27-50 prefilters; :58-78 residual) ---

def q19_mask_lineitem(l: T.LineItemTable):
    """Relaxed prefilter; out.key = l_partkey, out.payload = lineitem rowID."""
    mask = (
        (l.quantity >= 1)
        & (l.quantity <= 30)
        & ((l.shipmode == T.L_SHIPMODE_AIR) | (l.shipmode == T.L_SHIPMODE_AIR_REG))
        & (l.shipinstruct == T.L_SHIPINSTRUCT_DELIVER_IN_PERSON)
    )
    return mask, l.partkey, l.rowid


@jax.jit
def q19_filter_lineitem(l: T.LineItemTable):
    return _compact_kp(*q19_mask_lineitem(l))


def q19_mask_part(p: T.PartTable):
    mask = (
        ((p.brand == T.P_BRAND_12) | (p.brand == T.P_BRAND_23) | (p.brand == T.P_BRAND_34))
        & (p.container >= 1)
        & (p.container <= 12)
        & (p.size >= 1)
        & (p.size <= 15)
    )
    return mask, p.key, p.rowid


@jax.jit
def q19_filter_part(p: T.PartTable):
    return _compact_kp(*q19_mask_part(p), PAD_R_SIDE)


@jax.jit
def q19_residual_predicate(p: T.PartTable, l: T.LineItemTable, part_rowid, li_rowid, valid):
    """Exact disjunctive residual re-evaluated per join-output row via rowID
    lookups into both base tables (q19FinalPredicate, Q19Predicates.hpp:58-78).
    """
    pr = jnp.where(valid, part_rowid, 0)
    lr = jnp.where(valid, li_rowid, 0)
    brand = p.brand[pr]
    container = p.container[pr]
    size = p.size[pr]
    qty = l.quantity[lr]

    p1 = (
        (brand == T.P_BRAND_12)
        & (container >= 1) & (container <= 4)      # SM_CASE..SM_PKG
        & (size >= 1) & (size <= 5)
        & (qty >= 1) & (qty <= 11)
    )
    p2 = (
        (brand == T.P_BRAND_23)
        & (container >= 5) & (container <= 8)      # MED_BAG..MED_PACK
        & (size >= 1) & (size <= 10)
        & (qty >= 10) & (qty <= 20)
    )
    p3 = (
        (brand == T.P_BRAND_34)
        & (container >= 9) & (container <= 12)     # LG_CASE..LG_PKG
        & (size >= 1) & (size <= 15)
        & (qty >= 20) & (qty <= 30)
    )
    return valid & (p1 | p2 | p3)
