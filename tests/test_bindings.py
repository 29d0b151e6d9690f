"""Binding smoke tests (reference: binding/*/test/*).

The C ABI shim is the load-bearing surface (Go / Flutter layer over
it); it embeds CPython and re-exports setup/prove/verify with the
reference error codes (binding/c/native/src/lib.rs:51-117). Built and
run here with the system toolchain.
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CDIR = os.path.join(REPO, "bindings", "c")


@pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("make") is None,
    reason="C toolchain not available",
)
def test_c_binding_end_to_end():
    """make -C bindings/c test: compile the embedded-CPython shim, run
    setup -> prove -> verify -> tampered-proof-rejected through the C ABI."""
    proc = subprocess.run(
        ["make", "-C", CDIR, "clean", "test"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "ALL C BINDING TESTS PASS" in proc.stdout


def test_python3_binding_surface():
    """bindings/python3 re-exports the 4-function reference surface."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "bindings", "python3"))
    try:
        import za2py
    finally:
        sys.path.pop(0)
    for fn in ("setup", "prove", "verify", "verbose"):
        assert callable(getattr(za2py, fn))
