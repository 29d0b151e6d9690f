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


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_flutter_binding_compiles():
    """The Flutter shim is plain C ABI over za2c.h: build it as a
    shared object so the source cannot rot (reference ships a built
    mobile library; this is the compile probe for it)."""
    out = os.path.join(REPO, "bindings", "flutter", "libza2flutter_ci.so")
    proc = subprocess.run(
        ["g++", "-shared", "-fPIC", "-o", out,
         os.path.join(REPO, "bindings", "flutter", "za2flutter.cpp")],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    os.remove(out)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_js_binding_compile_probe():
    """node-gyp is absent on this image; compile-probe the N-API addon
    against the vendored declaration stub so the C++ source stays
    buildable (real builds: binding.gyp + genuine node headers).
    Mirrors the reference's runnable js smoke (binding/js/test/test.js)
    at the fidelity the image allows."""
    proc = subprocess.run(
        ["g++", "-fsyntax-only", "-std=c++17",
         "-I", os.path.join(REPO, "bindings", "js", "ci_stub"),
         os.path.join(REPO, "bindings", "js", "za2node.cc")],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr


@pytest.mark.skipif(shutil.which("node") is None
                    or shutil.which("node-gyp") is None,
                    reason="no node toolchain")
def test_js_binding_smoke():
    """Full node-gyp build + test.js (reference binding/js/test)."""
    jsdir = os.path.join(REPO, "bindings", "js")
    build = subprocess.run(["node-gyp", "rebuild"], cwd=jsdir,
                           capture_output=True, text=True, timeout=600)
    assert build.returncode == 0, build.stdout + build.stderr
    run = subprocess.run(["node", "test.js"], cwd=jsdir,
                         capture_output=True, text=True, timeout=600,
                         env={**os.environ, "PYTHONPATH": REPO})
    assert run.returncode == 0, run.stdout + run.stderr


@pytest.mark.skipif(shutil.which("go") is None, reason="no go toolchain")
def test_go_binding_smoke():
    """go vet + the reference-style smoke (binding/go/test/test.go):
    requires libza2c built first."""
    subprocess.run(["make", "-C", CDIR, "libza2c.so"], check=True,
                   timeout=600, env={**os.environ, "PYTHONPATH": REPO})
    godir = os.path.join(REPO, "bindings", "go")
    proc = subprocess.run(["go", "vet", "."], cwd=godir,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
