"""Round-3 geometry sweep of the keys-only count pipeline: block_rows x
(slot_rows, f1, f2, kd_slot_rows) variants vs the default, full workload.
Run on the chip; keep the winner as the new Rho3Params default if it
beats 1649 M rows/s meaningfully."""
import sys
import time

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env, hard_sync

ensure_platform_from_env()

import jax

from aqp_tpu.data import create_relation_fk, create_relation_pk
from aqp_tpu.ops.pallas.rho3 import Rho3Params, rho_join_count_v3

NR, NS = 13_107_200, 52_428_800
relR = create_relation_pk(NR, seed=555)
relS = create_relation_fk(NS, NR, seed=777)
rk, rp, sk, sp = relR.key, relR.payload, relS.key, relS.payload
hard_sync((rk, sk))

VARIANTS = {
    "default(1024,32,36,16,64)": Rho3Params(),
    # wider K1 slots: fewer K2 merge levels (group 16), bigger capacity
    "slot64(1024,64,36,16,64)": Rho3Params(slot_rows=64),
    # bigger K1 block: one more K1 level, one fewer K2 level
    "block2048(2048,64,36,16,64)": Rho3Params(block_rows=2048, slot_rows=64),
    # fanout rebalance: more level-1 buckets, fewer level-2
    "f72(1024,32,72,8,64)": Rho3Params(f1=72, f2=8),
    # fewer level-1, more level-2
    "f18(1024,64,18,32,32)": Rho3Params(f1=18, f2=32, slot_rows=64,
                                        kd_slot_rows=32),
    # finer fine slots: smaller K3 windows
    "kd32(1024,32,36,16,32)": Rho3Params(kd_slot_rows=32),
    "kd128(1024,32,36,16,128)": Rho3Params(kd_slot_rows=128),
}

for name, prm in VARIANTS.items():
    try:
        @jax.jit
        def f(rk, rp, sk, sp, prm=prm):
            m, c, o = rho_join_count_v3(rk, rp, sk, sp, prm=prm,
                                        with_checksum=False)
            return m, o

        m, o = f(rk, rp, sk, sp)
        hard_sync(m)
        if int(o) != 0:
            print(f"{name:32s} OVERFLOW {int(o)}", flush=True)
            continue
        assert int(m) == NS, (name, int(m))
        t0 = time.perf_counter()
        for _ in range(5):
            m, o = f(rk, rp, sk, sp)
        hard_sync(m)
        dt = (time.perf_counter() - t0) / 5
        print(f"{name:32s} {dt * 1e3:8.2f} ms  "
              f"{(NR + NS) / dt / 1e6:8.0f} M rows/s", flush=True)
    except Exception as e:
        print(f"{name:32s} ERROR {str(e)[:90]}", flush=True)
