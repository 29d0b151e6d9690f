"""Witness-trace compiler: record / replay / guard-divergence fallback.

The e2e contract (ADVICE round 1): the second prove against the same pk
must actually REPLAY the cached witness program (not re-interpret), and
an input driving different control flow must fall back transparently and
still produce a valid proof without clobbering the existing cache.
"""

import json
import logging
import os

from za_tpu.algebra import FS
from za_tpu.groth16 import helper
from za_tpu.groth16.helper import prove, setup, verify


FACTOR = """
template Factor() {
  signal private input p;
  signal private input q;
  signal input r;
  p * q === r;
}
component main = Factor();
"""

# is_zero-style branch: the witness path differs when `a` is zero
# (inverse exists vs not), like circomlib IsZero
BRANCHY = """
template B() {
  signal input a;
  signal inv;
  signal output out;
  #[w] if (a == 0) {
    inv <-- 0;
  } else {
    inv <-- 1 / a;
  }
  out <== -a*inv + 1;
  a*out === 0;
}
component main = B();
"""


def _setup(tmp_path, circuit):
    circ = tmp_path / "circuit.za"
    circ.write_text(circuit)
    pk = str(tmp_path / "proving.key")
    vk_json = setup(str(circ), pk, verifier_type="json")
    return pk, vk_json


def test_second_prove_replays(tmp_path, caplog):
    pk, vk = _setup(tmp_path, FACTOR)
    inputs = [("main.p", FS(3)), ("main.q", FS(5)), ("main.r", FS(15))]

    proof1 = prove(pk, inputs)
    assert os.path.exists(pk + ".wtrace"), "first prove must cache a trace"
    assert verify(vk, proof1)

    with caplog.at_level(logging.INFO, logger="za_tpu"):
        proof2 = prove(pk, [("main.p", FS(7)), ("main.q", FS(11)),
                            ("main.r", FS(77))])
    assert verify(vk, proof2)
    assert any("Witness replay time" in r.message for r in caplog.records), \
        "second prove must replay the compiled trace"
    assert not any("re-interpreting" in r.message for r in caplog.records)


def test_divergent_input_falls_back(tmp_path, caplog):
    pk, vk = _setup(tmp_path, BRANCHY)

    proof1 = prove(pk, [("main.a", FS(5))])
    assert verify(vk, proof1)
    cache_before = open(pk + ".wtrace").read()

    # a=0 takes the other branch of the #[w] if -> guard divergence
    with caplog.at_level(logging.INFO, logger="za_tpu"):
        proof2 = prove(pk, [("main.a", FS(0))])
    assert verify(vk, proof2)
    assert any("diverged" in r.message for r in caplog.records)

    # the existing cache survives the divergence (no rewrite churn)
    assert open(pk + ".wtrace").read() == cache_before

    # and the original path still replays
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="za_tpu"):
        proof3 = prove(pk, [("main.a", FS(9))])
    assert verify(vk, proof3)
    assert any("Witness replay time" in r.message for r in caplog.records)


def test_wtrace_file_is_data_only(tmp_path):
    pk, _ = _setup(tmp_path, FACTOR)
    prove(pk, [("main.p", FS(2)), ("main.q", FS(3)), ("main.r", FS(6))])
    # loading must never execute code: the sidecar is plain JSON
    with open(pk + ".wtrace") as f:
        d = json.load(f)
    assert d["version"] == 1
    assert set(d) >= {"pk_digest", "input_names", "tape", "signal_nodes"}


def test_corrupt_wtrace_ignored(tmp_path):
    pk, vk = _setup(tmp_path, FACTOR)
    inputs = [("main.p", FS(2)), ("main.q", FS(3)), ("main.r", FS(6))]
    prove(pk, inputs)
    with open(pk + ".wtrace", "w") as f:
        f.write("{not json")
    assert verify(vk, prove(pk, inputs))  # silently re-interprets
