"""Driver entry-point regression tests.

Round-1 verdict: the driver's multichip dryrun crashed on the bench host
because ``dryrun_multichip`` assumed ``jax.devices()`` already exposed
n devices (MULTICHIP_r01 rc=1). These tests pin both recovery paths:
inline (enough devices already, the conftest mesh) and subprocess
re-exec (host exposes fewer devices than requested).
"""

import os
import pytest
import subprocess
import sys

# whole-module e2e tier: deselect with -m 'not slow' for the smoke run
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles():
    import jax
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0]


def test_dryrun_inline_on_virtual_mesh():
    """conftest provisions 8 CPU devices → the inline path must run."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    g.dryrun_multichip(8)


def test_dryrun_self_provisions_when_host_has_one_device():
    """Simulate the bench host: a parent process whose backend has a single
    device must still complete dryrun_multichip(8) (via subprocess re-exec
    with a virtual CPU mesh)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # 1 CPU device in the parent
    env.pop("ANCE_DRYRUN_INLINE", None)
    code = ("import jax; assert len(jax.devices()) == 1, jax.devices();\n"
            "import __graft_entry__ as g; g.dryrun_multichip(8);\n"
            "print('OUTER_OK')")
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    assert "OUTER_OK" in res.stdout
    assert "step ok" in res.stdout
