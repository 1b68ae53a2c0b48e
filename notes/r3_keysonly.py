"""Round-3: keys-only count pipeline vs checksummed, async-loop timing."""
import os, sys, time
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from aqp_tpu.data import create_relation_pk, create_relation_fk
from aqp_tpu.ops.pallas.rho3 import rho_join_count_v3

NR, NS = 13_107_200, 52_428_800
relR = create_relation_pk(NR, seed=11111)
relS = create_relation_fk(NS, NR, seed=22222)
rk, rp, sk, sp = relR.key, relR.payload, relS.key, relS.payload
jax.block_until_ready((rk, sk))
print("gen done", flush=True)

def timeit_async(name, fn, reps=10):
    t0 = time.perf_counter()
    out = fn(); jax.block_until_ready(out)
    print(f"{name}: first call {time.perf_counter()-t0:.1f}s m={int(out[0])}", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    m = int(out[0])  # forced scalar fetch of the last call
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms/call -> {(NR+NS)/dt/1e6:.0f} M rows/s", flush=True)

timeit_async("keysonly", lambda: rho_join_count_v3(rk, rp, sk, sp, with_checksum=False))
timeit_async("checksum", lambda: rho_join_count_v3(rk, rp, sk, sp))
