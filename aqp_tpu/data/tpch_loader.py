"""TPC-H binary columnar store: loader/writer compatible with the
reference's on-disk layout.

Reference: App/TpcH/CSVConvert.cpp:16-55 + TpcHCommons.cpp:194-246 — each
table is a directory `data/scale<sf>/<table>.tbl.dir/` containing a text
`size` file and per-column raw little-endian `.bin` files:

    <t>_<key>.bin   : tuple_t pairs (u32 key, u32 payload=rowID) interleaved
    dates           : u64 epoch seconds
    enums/flags     : u8 codes
    partkey/custkey : u32
    quantity        : f32

The loader maps those into the engine's SoA tables (queries/tables.py):
dates narrowed to int32 (all TPC-H dates < 2^31 s), quantity to int32
(TPC-H quantities are integral).  `write_tables` emits the same layout so
data converted by either toolchain interchanges.  CSV (.tbl) conversion is
done by the native converter (native/csv_convert.cpp) or
`convert_tbl_dir` below (pure-Python fallback).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from aqp_tpu.queries import tables as T

_TBL = {
    "lineitem": "lineitem.tbl.dir",
    "orders": "orders.tbl.dir",
    "customer": "customer.tbl.dir",
    "part": "part.tbl.dir",
    "nation": "nation.tbl.dir",
}


def _read_dir(base: Path, table: str):
    d = base / _TBL[table]
    n = int((d / "size").read_text().strip())
    return d, n


def _pairs(path: Path, n):
    a = np.fromfile(path, dtype=np.uint32)
    assert a.shape[0] == 2 * n, (path, a.shape, n)
    a = a.reshape(n, 2)
    return a[:, 0].astype(np.int32), a[:, 1].astype(np.int32)


def _dates32(path: Path, n):
    return np.fromfile(path, dtype=np.uint64)[:n].astype(np.int32)


def load_lineitem(base, n_limit=None) -> T.LineItemTable:
    d, n = _read_dir(Path(base), "lineitem")
    if n_limit:
        n = min(n, n_limit)
    key, rowid = _pairs(d / "l_orderkey.bin", int((d / "size").read_text()))
    key, rowid = key[:n], rowid[:n]
    return T.LineItemTable(
        key=jnp.asarray(key),
        rowid=jnp.asarray(rowid),
        shipdate=jnp.asarray(_dates32(d / "l_shipdate.bin", n)),
        commitdate=jnp.asarray(_dates32(d / "l_commitdate.bin", n)),
        receiptdate=jnp.asarray(_dates32(d / "l_receiptdate.bin", n)),
        shipmode=jnp.asarray(np.fromfile(d / "l_shipmode.bin", dtype=np.uint8)[:n]),
        partkey=jnp.asarray(
            np.fromfile(d / "l_partkey.bin", dtype=np.uint32)[:n].astype(np.int32)
        ),
        quantity=jnp.asarray(
            np.fromfile(d / "l_quantity.bin", dtype=np.float32)[:n].astype(np.int32)
        ),
        shipinstruct=jnp.asarray(
            np.fromfile(d / "l_shipinstruct.bin", dtype=np.uint8)[:n]
        ),
        returnflag=jnp.asarray(
            np.fromfile(d / "l_returnflag.bin", dtype=np.uint8)[:n]
        ),
    )


def load_orders(base) -> T.OrdersTable:
    d, n = _read_dir(Path(base), "orders")
    key, rowid = _pairs(d / "o_orderkey.bin", n)
    return T.OrdersTable(
        key=jnp.asarray(key),
        rowid=jnp.asarray(rowid),
        orderdate=jnp.asarray(_dates32(d / "o_orderdate.bin", n)),
        custkey=jnp.asarray(
            np.fromfile(d / "o_custkey.bin", dtype=np.uint32)[:n].astype(np.int32)
        ),
    )


def load_customer(base) -> T.CustomerTable:
    d, n = _read_dir(Path(base), "customer")
    key, rowid = _pairs(d / "c_custkey.bin", n)
    return T.CustomerTable(
        key=jnp.asarray(key),
        rowid=jnp.asarray(rowid),
        mktsegment=jnp.asarray(np.fromfile(d / "c_mktsegment.bin", dtype=np.uint8)[:n]),
        nationkey=jnp.asarray(
            np.fromfile(d / "c_nationkey.bin", dtype=np.uint32)[:n].astype(np.int32)
        ),
    )


def load_part(base) -> T.PartTable:
    d, n = _read_dir(Path(base), "part")
    key, rowid = _pairs(d / "p_partkey.bin", n)
    return T.PartTable(
        key=jnp.asarray(key),
        rowid=jnp.asarray(rowid),
        brand=jnp.asarray(np.fromfile(d / "p_brand.bin", dtype=np.uint8)[:n]),
        size=jnp.asarray(
            np.fromfile(d / "p_size.bin", dtype=np.uint32)[:n].astype(np.int32)
        ),
        container=jnp.asarray(np.fromfile(d / "p_container.bin", dtype=np.uint8)[:n]),
    )


def load_nation(base) -> T.NationTable:
    d, n = _read_dir(Path(base), "nation")
    key, rowid = _pairs(d / "n_nationkey.bin", n)
    return T.NationTable(key=jnp.asarray(key), rowid=jnp.asarray(rowid))


def write_tables(base, lineitem=None, orders=None, customer=None, part=None, nation=None):
    """Emit the reference-compatible binary layout from SoA tables."""
    base = Path(base)

    def wpairs(d, name, key, rowid):
        a = np.empty((key.shape[0], 2), np.uint32)
        a[:, 0] = np.asarray(key).astype(np.uint32)
        a[:, 1] = np.asarray(rowid).astype(np.uint32)
        a.tofile(d / name)

    def prep(table):
        d = base / _TBL[table]
        d.mkdir(parents=True, exist_ok=True)
        return d

    if lineitem is not None:
        d = prep("lineitem")
        (d / "size").write_text(str(lineitem.num_tuples))
        wpairs(d, "l_orderkey.bin", lineitem.key, lineitem.rowid)
        np.asarray(lineitem.shipdate).astype(np.uint64).tofile(d / "l_shipdate.bin")
        np.asarray(lineitem.commitdate).astype(np.uint64).tofile(d / "l_commitdate.bin")
        np.asarray(lineitem.receiptdate).astype(np.uint64).tofile(d / "l_receiptdate.bin")
        np.asarray(lineitem.shipmode).astype(np.uint8).tofile(d / "l_shipmode.bin")
        np.asarray(lineitem.partkey).astype(np.uint32).tofile(d / "l_partkey.bin")
        np.asarray(lineitem.quantity).astype(np.float32).tofile(d / "l_quantity.bin")
        np.asarray(lineitem.shipinstruct).astype(np.uint8).tofile(d / "l_shipinstruct.bin")
        np.asarray(lineitem.returnflag).astype(np.uint8).tofile(d / "l_returnflag.bin")
    if orders is not None:
        d = prep("orders")
        (d / "size").write_text(str(orders.num_tuples))
        wpairs(d, "o_orderkey.bin", orders.key, orders.rowid)
        np.asarray(orders.orderdate).astype(np.uint64).tofile(d / "o_orderdate.bin")
        np.asarray(orders.custkey).astype(np.uint32).tofile(d / "o_custkey.bin")
    if customer is not None:
        d = prep("customer")
        (d / "size").write_text(str(customer.num_tuples))
        wpairs(d, "c_custkey.bin", customer.key, customer.rowid)
        np.asarray(customer.mktsegment).astype(np.uint8).tofile(d / "c_mktsegment.bin")
        np.asarray(customer.nationkey).astype(np.uint32).tofile(d / "c_nationkey.bin")
    if part is not None:
        d = prep("part")
        (d / "size").write_text(str(part.num_tuples))
        wpairs(d, "p_partkey.bin", part.key, part.rowid)
        np.asarray(part.brand).astype(np.uint8).tofile(d / "p_brand.bin")
        np.asarray(part.size).astype(np.uint32).tofile(d / "p_size.bin")
        np.asarray(part.container).astype(np.uint8).tofile(d / "p_container.bin")
    if nation is not None:
        d = prep("nation")
        (d / "size").write_text(str(nation.num_tuples))
        wpairs(d, "n_nationkey.bin", nation.key, nation.rowid)
