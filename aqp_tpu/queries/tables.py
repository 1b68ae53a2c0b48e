"""TPC-H columnar tables (structure-of-arrays) + synthetic generator.

Mirrors lib/SharedHeaders/include/TpcHTypes.hpp:50-88: each table is parallel
device arrays; the `<t>_key` column carries (key, rowID) semantics — here as
two arrays `key` and `rowid` ("key->orderkey, value->rowID").  Dates are
pre-converted to epoch seconds (int32 — all TPC-H dates < 2^31 s), strings to
uint8 enum codes, exactly like the reference's CSV→binary conversion
(TpcHTypes.hpp:8-43, TpcHCommons.cpp:60-90).

The synthetic generator ("dbgen-lite") produces seeded TPC-H-shaped data at
a given scale factor with the reference's enum codings, for benchmarks and
tests without shipping TPC-H data.  Real converted data loads through
data/tpch_loader.py using the same binary column layout as CSVConvert.cpp.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# --- enum codes (TpcHTypes.hpp:7-31) ---
L_SHIPMODE_MAIL = 1
L_SHIPMODE_SHIP = 2
L_SHIPMODE_AIR = 3
L_SHIPMODE_AIR_REG = 4
L_SHIPINSTRUCT_DELIVER_IN_PERSON = 1
MKT_BUILDING = 1
P_BRAND_12 = 1
P_BRAND_23 = 2
P_BRAND_34 = 3
# containers 1..12 are the SM/MED/LG codes (TpcHTypes.hpp:19-30)
L_RETURNFLAG_R = 82  # 'R'

# --- date constants, epoch seconds (TpcHTypes.hpp:33-41) ---
TS_1995_01_01 = 788918400
TS_1995_03_15 = 795225600
TS_1995_03_16 = 795312000
TS_1993_10_01 = 749433600
TS_1994_01_01 = 757382400
TS_1992_01_01 = 694224000
TS_1998_12_01 = 912470400


def _reg(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(cls))


@_reg
class LineItemTable:
    key: jax.Array       # l_orderkey
    rowid: jax.Array
    shipdate: jax.Array  # int32 epoch seconds
    commitdate: jax.Array
    receiptdate: jax.Array
    shipmode: jax.Array  # uint8 codes
    partkey: jax.Array
    quantity: jax.Array  # int32 (TPC-H quantities are integral 1..50)
    shipinstruct: jax.Array
    returnflag: jax.Array

    @property
    def num_tuples(self):
        return self.key.shape[0]


@_reg
class OrdersTable:
    key: jax.Array  # o_orderkey
    rowid: jax.Array
    orderdate: jax.Array
    custkey: jax.Array

    @property
    def num_tuples(self):
        return self.key.shape[0]


@_reg
class CustomerTable:
    key: jax.Array  # c_custkey
    rowid: jax.Array
    mktsegment: jax.Array
    nationkey: jax.Array

    @property
    def num_tuples(self):
        return self.key.shape[0]


@_reg
class PartTable:
    key: jax.Array  # p_partkey
    rowid: jax.Array
    brand: jax.Array
    size: jax.Array
    container: jax.Array

    @property
    def num_tuples(self):
        return self.key.shape[0]


@_reg
class NationTable:
    key: jax.Array  # n_nationkey
    rowid: jax.Array

    @property
    def num_tuples(self):
        return self.key.shape[0]


def _u(k, n, lo, hi, dtype=jnp.int32):
    return jax.random.randint(k, (n,), lo, hi, dtype=dtype)


def generate_tpch_tables(scale: float = 0.01, seed: int = 42):
    """Seeded TPC-H-shaped tables at `scale` (sf=1 → 6M lineitems).

    Key relationships: orderkey dense {1..NO} (TPC-H's sparse orderkeys add
    nothing to join behavior), custkey/partkey uniform FKs into their dense
    PK domains — the same join topology as the real data.
    """
    NL = max(64, int(6_001_215 * scale))
    NO = max(32, int(1_500_000 * scale))
    NC = max(16, int(150_000 * scale))
    NP = max(16, int(200_000 * scale))
    NN = 25
    ks = jax.random.split(jax.random.PRNGKey(seed), 16)

    i32 = jnp.int32
    lineitem = LineItemTable(
        key=_u(ks[0], NL, 1, NO + 1),
        rowid=jnp.arange(NL, dtype=i32),
        shipdate=_u(ks[1], NL, TS_1992_01_01, TS_1998_12_01),
        commitdate=_u(ks[2], NL, TS_1992_01_01, TS_1998_12_01),
        receiptdate=_u(ks[3], NL, TS_1992_01_01, TS_1998_12_01),
        shipmode=_u(ks[4], NL, 1, 8).astype(jnp.uint8),  # 7 modes, codes 1..7
        partkey=_u(ks[5], NL, 1, NP + 1),
        quantity=_u(ks[6], NL, 1, 51),
        shipinstruct=_u(ks[7], NL, 1, 5).astype(jnp.uint8),  # 4 instr codes
        returnflag=jnp.take(
            jnp.asarray([65, 78, 82], jnp.uint8), _u(ks[8], NL, 0, 3)
        ),
    )
    orders = OrdersTable(
        key=jax.random.permutation(ks[9], NO).astype(i32) + 1,
        rowid=jnp.arange(NO, dtype=i32),
        orderdate=_u(ks[10], NO, TS_1992_01_01, TS_1998_12_01),
        custkey=_u(ks[11], NO, 1, NC + 1),
    )
    customer = CustomerTable(
        key=jax.random.permutation(ks[12], NC).astype(i32) + 1,
        rowid=jnp.arange(NC, dtype=i32),
        mktsegment=_u(ks[13], NC, 1, 6).astype(jnp.uint8),  # 5 segments
        nationkey=_u(ks[14], NC, 0, NN),
    )
    part = PartTable(
        key=jax.random.permutation(ks[15], NP).astype(i32) + 1,
        rowid=jnp.arange(NP, dtype=i32),
        brand=_u(ks[0], NP, 1, 6).astype(jnp.uint8),  # brands 1..5 (12/23/34 + 2)
        size=_u(ks[1], NP, 1, 51),
        container=_u(ks[2], NP, 1, 17).astype(jnp.uint8),  # 16 containers
    )
    nation = NationTable(
        key=jnp.arange(NN, dtype=i32), rowid=jnp.arange(NN, dtype=i32)
    )
    return lineitem, orders, customer, part, nation
