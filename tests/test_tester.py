"""Embedded #[test] template runner tests."""

import os

import pytest

from za_tpu.compiler.tester import run_embedded_tests

CIRCOMLIB_ZA_TEST = "/root/reference/interop/circuits/circomlib/za_test"


def write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return p


def test_embedded_pass(tmp_path):
    write(
        tmp_path,
        "circuit.za",
        """
        template Mul() {
            signal private input a;
            signal private input b;
            signal output out;
            out <== a * b;
        }

        #[test]
        template test_mul() {
            component main = Mul();
            main.a <== 6;
            main.b <== 7;
            main.out === 42;
        }
        """,
    )
    run_embedded_tests(str(tmp_path), "circuit.za")


def test_embedded_fail(tmp_path):
    write(
        tmp_path,
        "circuit.za",
        """
        template Mul() {
            signal private input a;
            signal private input b;
            signal output out;
            out <== a * b;
        }

        #[test]
        template test_mul() {
            component main = Mul();
            main.a <== 6;
            main.b <== 7;
            main.out === 43;
        }
        """,
    )
    with pytest.raises(Exception):
        run_embedded_tests(str(tmp_path), "circuit.za")


def test_embedded_prefix_filter(tmp_path):
    write(
        tmp_path,
        "circuit.za",
        """
        #[test]
        template test_ok() {
            var a = 1;
        }

        #[test]
        template bad_one() {
            signal x;
            x === 1;
        }
        """,
    )
    # only test_ok runs
    run_embedded_tests(str(tmp_path), "circuit.za", test_prefix="test_")


def test_binwitness_output(tmp_path, monkeypatch):
    write(
        tmp_path,
        "circuit.za",
        """
        template Mul() {
            signal private input a;
            signal private input b;
            signal output out;
            out <== a * b;
        }

        #[test]
        template test_mul() {
            component main = Mul();
            main.a <== 6;
            main.b <== 7;
            main.out === 42;
        }
        """,
    )
    monkeypatch.chdir(tmp_path)
    run_embedded_tests(str(tmp_path), "circuit.za", output_witness=True)
    data = (tmp_path / "test_mul.binwitness").read_bytes()
    # count(4 signals), 1, out=42, a=6, b=7  (w256w32 words)
    assert len(data) == 5 * 32
    assert int.from_bytes(data[0:4], "big") == 4
    assert int.from_bytes(data[32:36], "big") == 1
    assert int.from_bytes(data[64:68], "big") == 42
    assert int.from_bytes(data[96:100], "big") == 6
    assert int.from_bytes(data[128:132], "big") == 7


def test_include_and_dedup(tmp_path):
    write(tmp_path, "lib.za", "function double(x) { return 2*x; }")
    write(
        tmp_path,
        "circuit.za",
        """
        include "lib.za";
        include "lib.za";

        template T() {
            signal input x;
            x === 8;
        }

        #[test]
        template test_inc() {
            component main = T();
            main.x <== double(4);
        }
        """,
    )
    run_embedded_tests(str(tmp_path), "circuit.za")


@pytest.mark.skipif(
    not os.path.isdir(CIRCOMLIB_ZA_TEST),
    reason="circomlib interop fixtures not mounted",
)
def test_circomlib_comparators():
    """Interop check against vendored circomlib (reference interop crate)."""
    run_embedded_tests(CIRCOMLIB_ZA_TEST, "comparators.za")


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir(CIRCOMLIB_ZA_TEST),
    reason="circomlib interop fixtures not mounted",
)
def test_circomlib_full_suite():
    """The full circomlib conformance suite (reference interop crate,
    interop/src/lib.rs:27-46): sha256, EdDSA-MiMC/Poseidon, SMT
    verifier/processor, babyjub, comparators -- ~3 minutes."""
    run_embedded_tests(CIRCOMLIB_ZA_TEST, "all.za")


@pytest.mark.skipif(
    not os.path.isdir(os.path.dirname(CIRCOMLIB_ZA_TEST)),
    reason="circomlib interop fixtures not mounted",
)
def test_parse_all_circom_sources():
    """Every vendored circomlib .circom file parses (reference
    interop/src/lib.rs:9-24; exercises the /*#[]#*/ unescape path)."""
    from za_tpu.lang.parser import parse

    root = os.path.join(os.path.dirname(CIRCOMLIB_ZA_TEST), "circuits")
    files = sorted(
        os.path.join(dirpath, f)
        for dirpath, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".circom")
    )
    assert len(files) >= 25, f"expected vendored circuits, found {len(files)}"
    for path in files:
        with open(path) as fh:
            parse(fh.read())
