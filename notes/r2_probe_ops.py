"""Round-2 primitive probes: what does a bitonic stage cost, and which exotic
Mosaic ops are available on this chip (axis-0 gather, int8 MXU, in-kernel
scatter, transpose)?"""
import os, time
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from aqp_tpu.ops.pallas.blocksort import _stage, LANES

SUB = 1024
NB = 500  # headline block count
N = NB * SUB * LANES

f = jax.jit(lambda x: jnp.sum(x))
tiny = jnp.zeros((8,), jnp.int32)
int(f(tiny))
t0 = time.perf_counter()
for _ in range(5):
    int(f(tiny))
OH = (time.perf_counter() - t0) / 5
print(f"overhead {OH*1e3:.1f} ms", flush=True)

key = jax.random.randint(jax.random.PRNGKey(0), (NB * SUB, LANES), 0, 1 << 30,
                         jnp.int32)
pay = jax.random.randint(jax.random.PRNGKey(1), (NB * SUB, LANES), 0, 1 << 30,
                         jnp.int32)
jax.block_until_ready((key, pay))


def run(kernel, n_out=2, reps=3, name=""):
    try:
        outs = [jax.ShapeDtypeStruct((NB * SUB, LANES), jnp.int32)] * n_out
        fn = jax.jit(lambda k, p: pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=[pl.BlockSpec((SUB, LANES), lambda i: (i, 0))] * 2,
            out_specs=[pl.BlockSpec((SUB, LANES), lambda i: (i, 0))] * n_out,
            out_shape=outs,
        )(k, p))
        o = fn(key, pay)
        jax.block_until_ready(o)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            o = fn(key, pay)
            _ = o[0][0, 0].item()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:34s} {best*1e3 - OH*1e3:8.1f} ms", flush=True)
        return best - OH
    except Exception as e:
        print(f"{name:34s} FAILED: {str(e)[:200]}", flush=True)
        return None


# 1. full bitonic (pairs) — reference point
def full_sort(k_ref, p_ref, ok, op):
    from aqp_tpu.ops.pallas.blocksort import bitonic_sort_pairs
    k, p = bitonic_sort_pairs(k_ref[:], p_ref[:], SUB, True)
    ok[:] = k
    op[:] = p
run(full_sort, name="full bitonic 153 stages (pairs)")


# 2. sublane-only stages x125 (pairs)
def sublane_stages(k_ref, p_ref, ok, op):
    k, p = k_ref[:], p_ref[:]
    cnt = 0
    box = 2
    while box <= SUB * LANES:
        j = box // 2
        while j >= 1:
            if j < SUB:
                k, p = _stage(k, p, j, min(box, SUB * LANES), SUB, True)
                cnt += 1
            j //= 2
        box *= 2
    ok[:] = k
    op[:] = p
run(sublane_stages, name="125 sublane stages (pairs)")


# 3. lane-only stages x28 (pairs)
def lane_stages(k_ref, p_ref, ok, op):
    k, p = k_ref[:], p_ref[:]
    box = 2
    while box <= SUB * LANES:
        j = box // 2
        while j >= 1:
            if j >= SUB:
                k, p = _stage(k, p, j, box, SUB, True)
            j //= 2
        box *= 2
    ok[:] = k
    op[:] = p
run(lane_stages, name="28 lane-gather stages (pairs)")


# 4. keys-only full bitonic (single array net)
def keys_only(k_ref, p_ref, ok, op):
    from aqp_tpu.ops.pallas.blocksort import _partner_sub, _partner_lane
    k = k_ref[:]
    box = 2
    while box <= SUB * LANES:
        j = box // 2
        while j >= 1:
            if j < SUB:
                pk = _partner_sub(k, j, SUB)
                field = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
                upper = (field & j) != 0
            else:
                pk = _partner_lane(k, j // SUB, True)
                field = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
                upper = (field & (j // SUB)) != 0
            if box < SUB:
                dfield = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
                desc = (dfield & box) != 0
            elif box < SUB * LANES:
                dfield = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
                desc = (dfield & (box // SUB)) != 0
            else:
                desc = jnp.zeros(k.shape, bool)
            want_hi = upper ^ desc
            lt = pk < k
            take = (want_hi ^ lt) & (pk != k)
            k = jnp.where(take, pk, k)
            j //= 2
        box *= 2
    ok[:] = k
    op[:] = k
run(keys_only, name="full bitonic keys-only")


# 5. axis-0 take_along_axis (sublane dynamic gather)
def axis0_gather(k_ref, p_ref, ok, op):
    k = k_ref[:]
    idx = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0) ^ 1
    ok[:] = jnp.take_along_axis(k, idx, axis=0)
    op[:] = k
run(axis0_gather, name="take_along_axis axis=0 (x1)")


# 6. int8 matmul permutation: P(1024x1024) i8 @ X(1024x512) i8 -> i32
def i8_matmul(k_ref, p_ref, ok, op):
    dest = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)  # identity perm
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    P = (col == dest).astype(jnp.int8)  # (sub, sub)
    x8 = pltpu.bitcast(k_ref[:], jnp.int8).reshape(SUB, LANES * 4)
    y = jax.lax.dot_general(P, x8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    ok[:] = pltpu.bitcast(y.astype(jnp.int8).reshape(SUB, LANES, 4),
                          jnp.int32).reshape(SUB, LANES)
    op[:] = p_ref[:]
run(i8_matmul, name="i8 1024x1024 @ 1024x512 permute")


# 6b. bf16 matmul permutation of 16-bit halves
def bf16_matmul(k_ref, p_ref, ok, op):
    dest = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    P = (col == dest).astype(jnp.bfloat16)
    lo = (k_ref[:] & 0xFFFF).astype(jnp.float32).astype(jnp.bfloat16)
    y = jax.lax.dot_general(P, lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    ok[:] = y.astype(jnp.int32)
    op[:] = p_ref[:]
run(bf16_matmul, name="bf16 1024x1024 @ 1024x128 permute")


# 7. in-kernel scatter .at[].set on 2D
def scatter2d(k_ref, p_ref, ok, op):
    k = k_ref[:]
    idx = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
    ok[:] = jnp.zeros_like(k).at[idx, jax.lax.broadcasted_iota(
        jnp.int32, k.shape, 1)].set(k)
    op[:] = k
run(scatter2d, name="in-kernel 2D scatter .at[].set")


# 8. transpose cost (1024,128)<->(128,1024)
def transp(k_ref, p_ref, ok, op):
    k = k_ref[:]
    t = jnp.transpose(k.reshape(8, LANES, LANES), (0, 2, 1))
    ok[:] = t.reshape(SUB, LANES)
    op[:] = k
run(transp, name="8x(128,128) transpose (x1)")


# 9. 28-stage lane bitonic on rows (row sort by 12-bit composite, 1 array)
def row_sort(k_ref, p_ref, ok, op):
    k = k_ref[:]
    b = k >> 25  # 5-bit bucket
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    c = (b << 7) | lane
    box = 2
    while box <= LANES:
        j = box // 2
        while j >= 1:
            pc = jnp.take_along_axis(c, lane ^ j, axis=1)
            upper = (lane & j) != 0
            desc = (lane & box) != 0 if box < LANES else jnp.zeros(k.shape, bool)
            want_hi = upper ^ desc
            take = (want_hi ^ (pc < c)) & (pc != c)
            c = jnp.where(take, pc, c)
            j //= 2
        box *= 2
    src = c & 127
    ok[:] = jnp.take_along_axis(k, src, axis=1)
    op[:] = jnp.take_along_axis(p_ref[:], src, axis=1)
run(row_sort, name="28-stage lane sort rows + 2 gathers")
