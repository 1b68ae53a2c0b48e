"""jax.distributed bring-up path (subprocess: initialize mutates global
runtime state that must not leak into the suite's process)."""

import os
import subprocess
import sys


def test_bringup_noop_without_env():
    from aqp_tpu.parallel.bringup import initialize_distributed

    assert initialize_distributed() == 1  # no coordinator requested


def test_bringup_single_process_cluster():
    """num_processes=1 exercises the REAL initialize path (coordinator
    service + client handshake) on one machine."""
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "from aqp_tpu.parallel.bringup import initialize_distributed\n"
        "n = initialize_distributed('localhost:12399', 1, 0)\n"
        "import jax\n"
        "assert n == 1 and jax.process_count() == 1, n\n"
        "assert len(jax.devices()) >= 1\n"
        "print('bringup OK')\n"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, "-c", code], cwd=os.getcwd(),
                         env=env, capture_output=True, text=True,
                         timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "bringup OK" in out.stdout
