"""Round-3 phase split of the keys-only count pipeline (1649 M rows/s):
where do the 39.7 ms go now?  K1 / K1+K2 / full, keys-only vs checksummed,
plus transpose-count sensitivity via geometry variants."""
import functools
import sys
import time

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env, hard_sync

ensure_platform_from_env()

import jax
import jax.numpy as jnp

from aqp_tpu.data import create_relation_fk, create_relation_pk
from aqp_tpu.ops.pallas import rho3 as R
from aqp_tpu.ops.pallas.rho3 import HASH_C, Rho3Params, _partition_2level

NR, NS = 13_107_200, 52_428_800
relR = create_relation_pk(NR, seed=555)
relS = create_relation_fk(NS, NR, seed=777)
rk, rp, sk, sp = relR.key, relR.payload, relS.key, relS.payload
hard_sync((rk, sk))


def timeit(name, f, *args, reps=5):
    out = f(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:9.2f} ms   "
          f"{(NR + NS) / dt / 1e6:9.0f} M rows/s", flush=True)
    return dt


def k12_f(prm, with_payload):
    @jax.jit
    def f(rk, rp, sk, sp):
        k2, p2, nbg, ovf, alias = _partition_2level(
            rk, rp, sk, sp, prm, HASH_C, False, with_payload=with_payload)
        return ovf + k2[0, 0, 0, 0, 0]
    return f


def full_f(prm, with_checksum):
    @jax.jit
    def f(rk, rp, sk, sp):
        m, c, o = R.rho_join_count_v3(rk, rp, sk, sp, prm=prm,
                                      with_checksum=with_checksum)
        return m + o
    return f


prm = Rho3Params()
print(f"defaults: {prm}")
timeit("K1+K2 keys-only", k12_f(prm, False), rk, rp, sk, sp)
timeit("K1+K2 with payload", k12_f(prm, True), rk, rp, sk, sp)
timeit("full count keys-only", full_f(prm, False), rk, rp, sk, sp)
timeit("full count checksummed", full_f(prm, True), rk, rp, sk, sp)
