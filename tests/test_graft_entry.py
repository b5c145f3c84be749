"""Driver entry-point contract: dryrun_multichip must self-provision its
device mesh (VERDICT r1 #1 — the driver boots a single axon TPU and calls
this with no env staged)."""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_inprocess_with_enough_devices():
    # conftest provisions 8 virtual CPU devices; direct path.
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)


def test_dryrun_self_provisions_from_single_device_env():
    # Simulate the driver host: a process whose jax backend is already
    # initialized with ONE device must still complete dryrun_multichip(8)
    # (it re-execs itself with the virtual CPU mesh staged).
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "assert len(jax.devices()) == 1;"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout
