import os, time, json
os.environ.setdefault('LIBTPU_INIT_ARGS','--xla_tpu_scoped_vmem_limit_kib=100000')
T0=time.perf_counter()
def lap(msg):
    print(f"[{time.perf_counter()-T0:8.2f}s] {msg}", flush=True)
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
lap("jax imported")
jax.devices(); lap("devices")
from aqp_tpu.data import create_relation_pk, create_relation_fk
from aqp_tpu.engine import rho_join_count_fused
lap("aqp imports")
nr, ns = 13_107_200, 52_428_800
relR = create_relation_pk(nr, seed=11111)
jax.block_until_ready(relR.key); lap("R generated")
relS = create_relation_fk(ns, nr, seed=22222)
jax.block_until_ready(relS.key); lap("S generated")
m,c,ovf = rho_join_count_fused(relR.key, relR.payload, relS.key, relS.payload)
int(m); lap(f"first count join (compile) m={int(m)}")
t0=time.perf_counter()
m,c,ovf = rho_join_count_fused(relR.key, relR.payload, relS.key, relS.payload)
int(m); lap(f"second count join: {time.perf_counter()-t0:.4f}s")
