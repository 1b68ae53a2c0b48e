"""aqp_tpu — TPU-native analytical query-processing engine and benchmark suite.

A brand-new JAX/XLA/Pallas re-design of the capability set of
DataManagementLab/sgxv2-analytical-query-processing-benchmarks (EDBT 2025):
join algorithms (radix hash, no-partition hash, sort-merge, nested-loop,
adaptive/cracking), SIMD-style column scans, radix partitioning, hash
aggregation, TPC-H Q3/Q10/Q12/Q19 mini query plans, and a reproducible
experiment harness with per-phase timing — all as columnar integer relations
resident in HBM, executed as jitted SPMD programs over a TPU mesh.

Layer map (mirrors SURVEY.md §1, TPU-first):
  ops/        — L0: vectorized compute kernels (scan, partition, hash, sort)
  joins/      — L2: join algorithm library + dispatcher (run_join)
  relation.py — L1/L3: columnar Relation + join-result materialization
  queries/    — L5: TPC-H mini query engine (plans, filters, transformers)
  data/       — L7: data generation + TPC-H columnar loading
  parallel/   — distributed runtime: mesh, hash shuffle, skew handling
  utils/      — L8: timing/metric contract, logging, config
  harness/    — L9: experiment driver (config matrices → CSV)
"""

from aqp_tpu.relation import Relation, JoinResult
from aqp_tpu.config import JoinConfig
from aqp_tpu.joins.api import run_join, JOIN_ALGORITHMS

__version__ = "0.1.0"

__all__ = [
    "Relation",
    "JoinResult",
    "JoinConfig",
    "run_join",
    "JOIN_ALGORITHMS",
]
