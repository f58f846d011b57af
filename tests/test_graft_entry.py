"""Driver-hook tests that simulate the driver's actual code path.

The driver initializes the (single-chip) backend BEFORE calling
``dryrun_multichip`` — so the hook must detect the frozen platform and
re-exec itself in a scrubbed-env subprocess. Round 1 shipped a hook that
only worked pre-initialization (MULTICHIP_r01.json: ok=false); these tests
exercise the post-initialization path directly.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(**extra):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME", "PYTHONPATH")
    }
    env.update(extra)
    return env


def test_dryrun_multichip_after_backend_init():
    """Simulate the driver: initialize a 1-device backend, THEN call the hook
    asking for 8 devices. Must succeed via subprocess re-exec."""
    code = (
        "import os, sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "devs = jax.devices()  # freeze the platform at 1 device\n"
        "assert len(devs) == 1, devs\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(JAX_PLATFORMS="cpu"),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok: 8 devices" in proc.stdout


def test_dryrun_multichip_fresh_process():
    """The easy path: no backend initialized yet (driver calls hook first)."""
    code = (
        "import sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok: 8 devices" in proc.stdout
