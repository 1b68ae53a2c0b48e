"""Multi-host bring-up: jax.distributed initialization from environment.

Reference analog: the MPI/launcher bring-up the reference delegates to its
run scripts (SGXv2Scripts/scripts/run-all.sh environment plumbing); on TPU
pods the equivalent is `jax.distributed.initialize`, after which
`jax.devices()` spans every host's chips and the 2-axis mesh
(parallel/mesh.make_mesh_2d) lays DCN across processes and ICI within.

Environment contract (standard JAX cluster variables, overridable args):
  AQP_COORDINATOR  host:port of process 0 (default: single-process)
  AQP_NUM_PROCS    total process count
  AQP_PROC_ID      this process's index

Single-process calls are valid (num_processes=1) and exercised by the test
suite, so the bring-up path is covered even on one machine; on a real pod
the same code path scales out unchanged.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> int:
    """Idempotent jax.distributed bring-up; returns the process count.

    No-ops (returns 1) when neither args nor environment request a
    multi-process run — single-chip and CPU-mesh flows never pay for it.
    """
    global _initialized
    coordinator = coordinator or os.environ.get("AQP_COORDINATOR")
    num_processes = num_processes or int(
        os.environ.get("AQP_NUM_PROCS", "0")) or None
    process_id = (process_id if process_id is not None
                  else int(os.environ.get("AQP_PROC_ID", "-1")))
    if not coordinator and (num_processes is None or num_processes <= 1):
        return 1
    if _initialized:
        return jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator or "localhost:12321",
        num_processes=num_processes or 1,
        process_id=max(0, process_id),
    )
    _initialized = True
    return jax.process_count()
