"""Probe 3: register-resident tile sort + static-slice cross-tile exchange.

Lane-major element order: element e of a block lives at row e//128, lane
e%128.  (8,128) tile = 1024 consecutive elements.  Full block sort =
  tile_sort (55 stages, data in vregs, 1 VMEM pass)
  + for box in 2^11..: cross-tile exchange stages (aligned static slices,
    min/max, no rolls/masks) + one in-tile finishing pass (10 stages).
"""
import os, time
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

LANES = 128
ROWS = 512 * 1024  # 65.5M elements
N = ROWS * LANES

f = jax.jit(lambda x: jnp.sum(x))
int(f(jnp.zeros((8,), jnp.int32)))
t0 = time.perf_counter()
for _ in range(5):
    int(f(jnp.zeros((8,), jnp.int32)))
OH = (time.perf_counter() - t0) / 5
print(f"overhead {OH*1e3:.1f} ms", flush=True)

key = jax.random.randint(jax.random.PRNGKey(0), (ROWS, LANES), 0, 1 << 30,
                         jnp.int32)
pay = jax.random.randint(jax.random.PRNGKey(1), (ROWS, LANES), 0, 1 << 30,
                         jnp.int32)
jax.block_until_ready((key, pay))


def timeit(fn, *args, name="", reps=3):
    try:
        o = fn(*args)
        jax.block_until_ready(o)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            o = fn(*args)
            _ = (o[0] if isinstance(o, (tuple, list)) else o)[0, 0].item()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:46s} {best*1e3 - OH*1e3:8.2f} ms", flush=True)
        return o
    except Exception as e:
        print(f"{name:46s} FAILED: {str(e)[:150]}", flush=True)
        return None


# ---------------- A: in-register tile sort (8,128 tiles, lane-major) -------
def tile_stage(k, p, j, box, lane_iota, subl_iota, desc_tile):
    if j < LANES:
        idx = lane_iota ^ j
        pk = jnp.take_along_axis(k, idx, axis=1)
        pp = jnp.take_along_axis(p, idx, axis=1)
        upper = (lane_iota & j) != 0
    else:
        s = j // LANES
        r1k = pltpu.roll(k, s, axis=0)
        r2k = pltpu.roll(k, 8 - s, axis=0)
        r1p = pltpu.roll(p, s, axis=0)
        r2p = pltpu.roll(p, 8 - s, axis=0)
        upper = (subl_iota & s) != 0
        pk = jnp.where(upper, r1k, r2k)
        pp = jnp.where(upper, r1p, r2p)
    if box < LANES:
        desc = (lane_iota & box) != 0
    elif box <= 512:
        desc = (subl_iota & (box // LANES)) != 0
    else:
        desc = None
    want_hi = (upper ^ desc) if desc is not None else (
        upper ^ desc_tile if desc_tile is not None else upper)
    lt = pk < k
    take = (want_hi ^ lt) & (pk != k)
    return jnp.where(take, pk, k), jnp.where(take, pp, p)


def tile_sort_1024(k, p, lane_iota, subl_iota, desc_tile):
    box = 2
    while box <= 1024:
        j = box // 2
        while j >= 1:
            k, p = tile_stage(k, p, j, box if box < 1024 else 1024,
                              lane_iota, subl_iota,
                              desc_tile if box == 1024 else None)
            j //= 2
        box *= 2
    return k, p


WIN = 2048  # rows per grid step


def tile_sort_kernel(k_ref, p_ref, ok_ref, op_ref):
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    subl_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

    def body(i, _):
        k = k_ref[pl.ds(i * 8, 8), :]
        p = p_ref[pl.ds(i * 8, 8), :]
        desc = (i & 1) == 1  # alternate tile direction for mergeability
        k, p = tile_sort_1024(k, p, lane_iota, subl_iota, desc)
        ok_ref[pl.ds(i * 8, 8), :] = k
        op_ref[pl.ds(i * 8, 8), :] = p
        return 0

    jax.lax.fori_loop(0, WIN // 8, body, 0, unroll=False)


@jax.jit
def tile_sort_all(k, p):
    nb = ROWS // WIN
    return pl.pallas_call(
        tile_sort_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((WIN, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((WIN, LANES), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)] * 2,
    )(k, p)

out = timeit(tile_sort_all, key, pay, name="A: tile-sort 1024 (55 st, reg-resident)")

# correctness spot check
if out is not None:
    ks = np.asarray(out[0][:8]).reshape(-1)
    ref = np.sort(np.asarray(key[:8]).reshape(-1))
    ok = np.array_equal(ks, ref)
    ks2 = np.asarray(out[0][8:16]).reshape(-1)
    ref2 = np.sort(np.asarray(key[8:16]).reshape(-1))[::-1]
    print(f"   tile0 asc sorted: {ok}; tile1 desc sorted: "
          f"{np.array_equal(ks2, ref2)}", flush=True)


# ---------------- B: cross-tile exchange stage (static slices) -------------
def make_exchange_kernel(j_rows, box_rows, win):
    """One bitonic stage with stride j (rows) over a win-row window.
    Partner = row ^ j_rows; direction from (row & box_rows)."""

    def kernel(k_ref, p_ref, ok_ref, op_ref):
        for c0 in range(0, win, 2 * j_rows):
            desc = (c0 & box_rows) != 0
            ak = k_ref[c0:c0 + j_rows, :]
            bk = k_ref[c0 + j_rows:c0 + 2 * j_rows, :]
            ap = p_ref[c0:c0 + j_rows, :]
            bp = p_ref[c0 + j_rows:c0 + 2 * j_rows, :]
            lo = jnp.minimum(ak, bk)
            hi = jnp.maximum(ak, bk)
            a2 = hi if desc else lo
            b2 = lo if desc else hi
            take_a = a2 != ak
            take_b = b2 != bk
            ok_ref[c0:c0 + j_rows, :] = a2
            op_ref[c0:c0 + j_rows, :] = jnp.where(take_a, bp, ap)
            ok_ref[c0 + j_rows:c0 + 2 * j_rows, :] = b2
            op_ref[c0 + j_rows:c0 + 2 * j_rows, :] = jnp.where(take_b, ap, bp)

    return kernel


def exchange_all(k, p, j_rows, box_rows, win=2048):
    nb = ROWS // win
    return pl.pallas_call(
        make_exchange_kernel(j_rows, box_rows, win),
        grid=(nb,),
        in_specs=[pl.BlockSpec((win, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((win, LANES), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)] * 2,
    )(k, p)

fx = jax.jit(lambda k, p: exchange_all(k, p, 8, 16))
timeit(fx, key, pay, name="B: cross-tile stage j=8rows (1 stage)")

fx4 = jax.jit(lambda k, p: exchange_all(k, p, 512, 1024))
timeit(fx4, key, pay, name="B: cross-tile stage j=512rows")


# ---- B2: fused 3 cross-tile stages (j=32,16,8 rows) in one kernel
def make_fused3(win):
    def kernel(k_ref, p_ref, ok_ref, op_ref):
        srck, srcp, dstk, dstp = k_ref, p_ref, ok_ref, op_ref
        for j_rows in (32, 16, 8):
            for c0 in range(0, win, 2 * j_rows):
                desc = (c0 & 64) != 0
                ak = srck[c0:c0 + j_rows, :]
                bk = srck[c0 + j_rows:c0 + 2 * j_rows, :]
                ap = srcp[c0:c0 + j_rows, :]
                bp = srcp[c0 + j_rows:c0 + 2 * j_rows, :]
                lo = jnp.minimum(ak, bk)
                hi = jnp.maximum(ak, bk)
                a2 = hi if desc else lo
                b2 = lo if desc else hi
                dstk[c0:c0 + j_rows, :] = a2
                dstp[c0:c0 + j_rows, :] = jnp.where(a2 != ak, bp, ap)
                dstk[c0 + j_rows:c0 + 2 * j_rows, :] = b2
                dstp[c0 + j_rows:c0 + 2 * j_rows, :] = jnp.where(
                    b2 != bk, ap, bp)
            srck, srcp = dstk, dstp
    return kernel


@jax.jit
def fused3(k, p):
    win = 2048
    nb = ROWS // win
    return pl.pallas_call(
        make_fused3(win),
        grid=(nb,),
        in_specs=[pl.BlockSpec((win, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((win, LANES), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)] * 2,
    )(k, p)

timeit(fused3, key, pay, name="B2: 3 fused cross-tile stages")


# ---------------- C: pure VMEM r/w floor --------------------------------
def copy_kernel(k_ref, p_ref, ok_ref, op_ref):
    ok_ref[:] = k_ref[:] + 1
    op_ref[:] = p_ref[:] + 1


@jax.jit
def copy_all(k, p):
    win = 2048
    nb = ROWS // win
    return pl.pallas_call(
        copy_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((win, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((win, LANES), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)] * 2,
    )(k, p)

timeit(copy_all, key, pay, name="C: elementwise r/w floor (k,p)")


# ---------------- D: in-tile finishing pass (10 stages, reg-resident) ------
def make_finish_kernel(box_log):
    """Stages j=512..1 of a box (tile-local part), register resident."""
    def kernel(k_ref, p_ref, ok_ref, op_ref):
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        subl_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def body(i, _):
            k = k_ref[pl.ds(i * 8, 8), :]
            p = p_ref[pl.ds(i * 8, 8), :]
            desc = (i & (1 << (box_log - 13))) != 0 if box_log >= 13 else (
                (i & 1) == 1)
            j = 512
            while j >= 1:
                k, p = tile_stage(k, p, j, 1024, lane_iota, subl_iota, desc)
                j //= 2
            ok_ref[pl.ds(i * 8, 8), :] = k
            op_ref[pl.ds(i * 8, 8), :] = p
            return 0

        jax.lax.fori_loop(0, WIN // 8, body, 0, unroll=False)
    return kernel


@jax.jit
def finish_all(k, p):
    nb = ROWS // WIN
    return pl.pallas_call(
        make_finish_kernel(17),
        grid=(nb,),
        in_specs=[pl.BlockSpec((WIN, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((WIN, LANES), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)] * 2,
    )(k, p)

timeit(finish_all, key, pay, name="D: in-tile finishing pass (10 st)")
