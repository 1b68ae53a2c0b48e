"""Round-5 probe 2: where do the write-producing scans lose HBM bandwidth?

Ablation ladder on the index-scan pipeline (scan_index_fast):
  0. pure-DMA copy kernel           -> platform ceiling for HBM->HBM move
  1. u8 stream + count only          -> mask production cost (proven ~140)
  2. copy-through blocks (no map)    -> widen+block-output structure cost
  3. + lane-compaction map           -> map cost
  4. full pipeline w/ assemble       -> serving number
  5. XLA jnp.nonzero(size=cap)       -> compiler baseline
Sweeps w (window rows) and sel_hint.  Run ONLY when the chip is free.
"""
import gc
import sys
import time

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqp_tpu.utils.timing import hard_sync

T0 = time.monotonic()


def log(m):
    print(f"[{time.monotonic() - T0:7.1f}s] {m}", flush=True)


def timeit(fn, reps=5):
    out = fn()
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    hard_sync(out)
    return (time.perf_counter() - t0) / reps


N = 1 << 29
col = (jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 256, jnp.int32)
       ).astype(jnp.uint8)
hard_sync(col)
log(f"column ready: {N} u8")

# --- 0. pure DMA copy (u8 in, u8 out), whole rows per grid step
for w in (512, 2048, 8192):

    def _copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    @jax.jit
    def dma_copy(x, w=w):
        x2 = x.reshape(-1, 128)
        nb = x2.shape[0] // w
        return pl.pallas_call(
            _copy_kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((w, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((w, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        )(x2)

    t = timeit(lambda: dma_copy(col))
    log(f"0 dma-copy u8 w={w}: {t*1e3:.2f} ms "
        f"rw {2 * N / t / 1e9:.0f} GB/s")

# u8 in -> int32 out (the widening write amplification alone)
for w in (512, 2048):

    def _widen_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.int32)

    @jax.jit
    def widen_copy(x, w=w):
        x2 = x.reshape(-1, 128)
        nb = x2.shape[0] // w
        return pl.pallas_call(
            _widen_kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((w, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((w, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.int32),
        )(x2)

    t = timeit(lambda: widen_copy(col))
    log(f"0b widen-copy u8->i32 w={w}: {t*1e3:.2f} ms "
        f"read {N / t / 1e9:.0f} GB/s rw {5 * N / t / 1e9:.0f} GB/s")

# --- 1. count only (proven)
from aqp_tpu.ops.pallas.scan import scan_count_pallas

t = timeit(lambda: scan_count_pallas(col, 0, 63))
log(f"1 count: {t*1e3:.2f} ms read {N / t / 1e9:.0f} GB/s")

# --- 2-4. pipeline ablation via lanecompact internals
from aqp_tpu.ops.pallas import lanecompact as lc

for w in (512, 1024, 2048):
    for hint in (0.3, None):
        ow = lc.out_w_for(w, hint)
        try:
            t = timeit(lambda: lc._compact_windows(
                col, [], jnp.int32(0), jnp.int32(63), w, False,
                with_ids=True, fills=(), ow=ow, in_u8=True)[0][0])
            log(f"3 windows w={w} hint={hint} (ow={ow}): {t*1e3:.2f} ms "
                f"read {N / t / 1e9:.1f} GB/s")
        except Exception as e:
            log(f"3 windows w={w} hint={hint}: FAIL {type(e).__name__} {e}")
        gc.collect()

for w in (512, 1024, 2048):
    for hint in (0.3, None):
        try:
            t = timeit(lambda: lc.scan_index_fast(
                col, 0, 63, N // 128, w=w, sel_hint=hint))
            log(f"4 full w={w} hint={hint}: {t*1e3:.2f} ms "
                f"read {N / t / 1e9:.1f} GB/s")
        except Exception as e:
            log(f"4 full w={w} hint={hint}: FAIL {type(e).__name__} {e}")
        gc.collect()

# --- 5. XLA nonzero baseline
@functools.partial(jax.jit, static_argnames=("cap",))
def xla_nonzero(x, cap):
    m = (x >= 0) & (x <= 63)
    return jnp.nonzero(m, size=cap, fill_value=-1)[0]

try:
    t = timeit(lambda: xla_nonzero(col, N // 4 + 1024))
    log(f"5 xla-nonzero: {t*1e3:.2f} ms read {N / t / 1e9:.1f} GB/s")
except Exception as e:
    log(f"5 xla-nonzero: FAIL {type(e).__name__} {e}")

log("probe2 complete")
