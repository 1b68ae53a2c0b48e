"""Runtime configuration for the engine.

The reference drives variants through a CMake compile-time flag matrix
(UNROLL, MUTEX_QUEUE, CONSTANT_RADIX_BITS, FORCE_2_PHASES, CHUNKED_TABLE,
MAX_PARTITIONS, CACHE_DIVISOR, KEY_8B — Join-Benchmarks/README.md:104-117 and
lib/Joins/CMakeLists.txt:24-50) plus a getopt CLI (`joinconfig_t`,
lib/SharedHeaders/include/data-types.h:160-176).  On TPU every knob is a
runtime (jit-static) field of one dataclass — no rebuilds.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

# VMEM is the TPU analog of the reference's L2 cache when sizing radix
# partitions (radix_join.cpp:295-345 sizes partitions to L2/CACHE_DIVISOR).
VMEM_BYTES = 16 * 1024 * 1024
# Default target rows per final partition for partition-local join kernels.
DEFAULT_PARTITION_ROWS = 1 << 13


@dataclasses.dataclass(frozen=True)
class JoinConfig:
    """Jit-static join configuration (analog of joinconfig_t + CFLAGS matrix).

    Fields must stay hashable — the dataclass is passed as a static argument
    to jitted join entry points.
    """

    # Number of radix bits per relation pass; None → computed from |R| like
    # calc_num_radix_bits (radix_join.cpp:295-317) with VMEM standing in for L2.
    radix_bits: Optional[int] = None
    # Force number of partition passes (reference FORCE_2_PHASES / calc_num_passes
    # radix_join.cpp:319-329); None → derived.
    passes: Optional[int] = None
    # Materialize join output (key, r_payload, s_payload) — reference
    # MATERIALIZE / CHUNKED_TABLE.  False → count + checksum only.
    materialize: bool = False
    # 64-bit keys/payloads (reference KEY_8B, data-types.h:6-12).  The
    # generators produce int64 relations under key64 (requires
    # jax_enable_x64; the CLI --key64 flag sets it), every XLA engine is
    # dtype-generic, and the Pallas fast path (int32 packed keys) is
    # bypassed.
    key64: bool = False
    # Hash-table load factor for no-partition joins (npj_params.h sizes the
    # bucket array at |R|/BUCKET_SIZE).
    load_factor: float = 0.5
    # Bounded linear-probe window for open-addressing probes.
    # expected linear-probe displacement at load<=0.5 is < 1; the windowed
    # probe pays `window` HBM gathers per S row UNCONDITIONALLY (the rare
    # longer displacement falls to the bounded while-loop), so small wins:
    # chip-measured 2.2x probe throughput at 4 vs 8 (PHT_no vs PHT rows,
    # results/join-overview.csv)
    probe_window: int = 4
    # Rows per partition targeted by the partitioning planner.
    partition_rows: int = DEFAULT_PARTITION_ROWS
    # Use Pallas kernels where available (False → pure-XLA reference path).
    use_pallas: bool = True
    # Compute the uint32 payload checksum on count joins.  False serves the
    # reference's count branch faithfully — it accumulates matches only and
    # never reads payloads (radix_join.cpp:428-447) — and lets keys-only
    # kernels run (no payload lanes move).  Tests/oracles keep True.
    checksum: bool = True
    # Dense-PK fast path (joins/dense.py): serve FK→dense-PK joins through
    # a proven dense join index when |R| <= dense_path_max_r — the TPU
    # analog of the reference's cache-resident small-R advantage
    # (data/scaling-perf.csv 2026 M rows/s at 131k).  The proof
    # (sort(R.key) == [1..n]) is exact and cached; non-dense builds take
    # the general pipeline.  Gated by size so the real pipelines serve the
    # at-scale benchmarks.
    dense_path: bool = True
    dense_path_max_r: int = 1 << 21
    # Deferred validation: engines submit their best (hint-selected) tier
    # and return device-resident scalars WITHOUT any host synchronization —
    # no int(overflow) check, no int(matches) fetch.  Callers validate via
    # joins.api.finalize_join (which escalates on the rare overflow).  This
    # is the async-pipelined serving mode: back-to-back run_join calls
    # overlap dispatch with device execution (bench.py methodology; this
    # platform has a ~5-40 ms per-call dispatch floor).
    defer: bool = False
    # Per-phase staged timing: run each algorithm phase as its own dispatch
    # so PhaseTimer can attribute time (the reference's per-phase rdtscp
    # contract, radix_join.cpp:94-108).  False (default) serves each join
    # as ONE fused jitted program — one dispatch, phases reported as
    # join/total only.  The phase experiments set True.
    profile_phases: bool = False
    # NOTE: skew handling and sharded execution are NOT config fields — the
    # distributed API takes them explicitly where they act
    # (parallel/dist_join.dist_join_count_auto(skew_threshold=...) and the
    # mesh/axis arguments of parallel/*), mirroring the reference, where
    # task-queue stealing is a property of the runtime, not joinconfig_t.

    @property
    def key_dtype(self):
        return jnp.int64 if self.key64 else jnp.int32

    @property
    def payload_dtype(self):
        return jnp.int64 if self.key64 else jnp.int32

    def replace(self, **kw) -> "JoinConfig":
        return dataclasses.replace(self, **kw)
