"""Groth16 end-to-end + curve tests (reference parity:
prover/src/groth16/prover.rs:225-373)."""

import io

import pytest

from za_tpu.algebra import FS, Value
from za_tpu.compiler import Evaluator, Mode
from za_tpu.compiler.evaluator import Scope
from za_tpu.curve import (
    FR_ROOT_OF_UNITY, G1_GEN, G2_GEN, R, Fq12, g1_is_on_curve, g1_mul, g1_neg,
    g2_is_on_curve, g2_mul, multi_pairing, pairing,
)
from za_tpu.groth16 import (
    R1CS, generate_parameters, prove, verify_proof,
)
from za_tpu.groth16.domain import Domain, batch_inverse
from za_tpu.groth16 import format as fmt

CIRCUIT = """
template t() {
    signal private input a;
    signal private input b;
    signal output c;
    c <== a * b;
}
component main = t();
"""


def compile_constraints(circuit):
    ev = Evaluator(Mode.GEN_CONSTRAINTS)
    ev.eval_inline(Scope(True, None, "root"), circuit)
    return ev


def gen_witness(circuit, inputs):
    ev = Evaluator(Mode.GEN_WITNESS)
    for k, v in inputs.items():
        ev.set_deferred_value(k, Value(FS(v)))
    ev.eval_inline(Scope(True, None, "root"), circuit)
    return ev


# -- curve ---------------------------------------------------------------------


def test_generators_on_curve():
    assert g1_is_on_curve(G1_GEN)
    assert g2_is_on_curve(G2_GEN)
    assert g1_mul(G1_GEN, R) is None
    assert g2_mul(G2_GEN, R) is None


def test_root_of_unity():
    assert pow(FR_ROOT_OF_UNITY, 1 << 28, R) == 1
    assert pow(FR_ROOT_OF_UNITY, 1 << 27, R) != 1


def test_fr_generator_order():
    # known factorization of r-1 for BN254
    factors = [2, 3, 13, 29, 983, 11003, 237073, 405928799,
               1670836401704629, 13818364434197438864469338081]
    prod = 1
    rm1 = R - 1
    for f in factors:
        while rm1 % f == 0:
            rm1 //= f
    assert rm1 == 1, "factorization incomplete"
    from za_tpu.curve import FR_GENERATOR
    for f in factors:
        assert pow(FR_GENERATOR, (R - 1) // f, R) != 1


def test_pairing_bilinearity():
    e1 = pairing(G2_GEN, G1_GEN)
    assert e1.pow(R).is_one()
    assert not e1.is_one()
    assert pairing(G2_GEN, g1_mul(G1_GEN, 5)) == e1.pow(5)
    assert pairing(g2_mul(G2_GEN, 5), G1_GEN) == e1.pow(5)


def test_multi_pairing_cancellation():
    assert multi_pairing(
        [(G1_GEN, G2_GEN), (g1_neg(G1_GEN), G2_GEN)]
    ).is_one()


# -- domain --------------------------------------------------------------------


def test_ntt_roundtrip():
    d = Domain(16)
    coeffs = [i * 7 + 3 for i in range(16)]
    assert d.intt(d.ntt(coeffs)) == coeffs
    assert d.coset_intt(d.coset_ntt(coeffs)) == coeffs


def test_ntt_is_polyeval():
    d = Domain(8)
    coeffs = [5, 1, 0, 2, 0, 0, 0, 0]

    def poly(x):
        return sum(c * pow(x, i, R) for i, c in enumerate(coeffs)) % R

    evals = d.ntt(coeffs)
    w = 1
    for e in evals:
        assert e == poly(w)
        w = w * d.omega % R


def test_lagrange_at():
    d = Domain(8)
    tau = 12345
    lag = d.lagrange_at(tau)
    # sum L_k(tau) * f(w^k) == f(tau) for f of degree < 8
    coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
    evals = d.ntt(coeffs)
    f_tau = sum(l * e for l, e in zip(lag, evals)) % R
    expect = sum(c * pow(tau, i, R) for i, c in enumerate(coeffs)) % R
    assert f_tau == expect


def test_batch_inverse():
    vals = [3, 7, 11, 123456]
    invs = batch_inverse(vals)
    for v, iv in zip(vals, invs):
        assert v * iv % R == 1


# -- groth16 end-to-end --------------------------------------------------------


def test_groth16_end_to_end():
    ev = compile_constraints(CIRCUIT)
    r1cs = R1CS.from_constraints(ev.signals, ev.constraints, [])
    evw = gen_witness(CIRCUIT, {"main.a": 7, "main.b": 3})
    z = r1cs.assignment_from_signals(evw.signals)
    assert z == [1, 21, 7, 3]
    assert r1cs.is_satisfied(z)

    params = generate_parameters(r1cs, tau=11, alpha=3, beta=5, gamma=7, delta=9)
    proof = prove(params, r1cs, z, r=13, s=17)
    assert verify_proof(params.vk, proof, [21])
    assert not verify_proof(params.vk, proof, [22])


def test_groth16_deterministic_replay():
    ev = compile_constraints(CIRCUIT)
    r1cs = R1CS.from_constraints(ev.signals, ev.constraints, [])
    evw = gen_witness(CIRCUIT, {"main.a": 7, "main.b": 3})
    z = r1cs.assignment_from_signals(evw.signals)
    params = generate_parameters(r1cs, tau=11, alpha=3, beta=5, gamma=7, delta=9)
    p1 = prove(params, r1cs, z, r=13, s=17)
    p2 = prove(params, r1cs, z, r=13, s=17)
    assert p1.a == p2.a and p1.b == p2.b and p1.c == p2.c


def test_groth16_bigger_circuit():
    circuit = """
    template chain(N) {
        signal input x;
        signal output out;
        signal t[N];
        t[0] <== x * x;
        for (var i=1;i<N;i+=1) {
            t[i] <== t[i-1] * x + i;
        }
        out <== t[N-1];
    }
    component main = chain(8);
    """
    ev = compile_constraints(circuit)
    r1cs = R1CS.from_constraints(ev.signals, ev.constraints, [])
    evw = gen_witness(circuit, {"main.x": 3})
    z = r1cs.assignment_from_signals(evw.signals)
    assert r1cs.is_satisfied(z)
    params = generate_parameters(r1cs)
    proof = prove(params, r1cs, z)
    pub = z[1 : r1cs.num_inputs]
    assert verify_proof(params.vk, proof, pub)
    assert not verify_proof(params.vk, proof, [x + 1 for x in pub])


# -- formats -------------------------------------------------------------------


def test_proof_json_roundtrip():
    ev = compile_constraints(CIRCUIT)
    r1cs = R1CS.from_constraints(ev.signals, ev.constraints, [])
    evw = gen_witness(CIRCUIT, {"main.a": 7, "main.b": 3})
    z = r1cs.assignment_from_signals(evw.signals)
    params = generate_parameters(r1cs, tau=11, alpha=3, beta=5, gamma=7, delta=9)
    proof = prove(params, r1cs, z, r=13, s=17)

    pj = fmt.proof_to_json(proof, [("main.c", FS(21))])
    proof2, inputs = fmt.proof_from_json(pj)
    assert inputs == [21]
    assert proof2.a == proof.a and proof2.b == proof.b and proof2.c == proof.c

    vj = fmt.vk_to_json(params.vk, ["main.c"])
    vk2, names = fmt.vk_from_json(vj)
    assert names == ["main.c"]
    assert verify_proof(vk2, proof2, inputs)


def test_pk_roundtrip():
    ev = compile_constraints(CIRCUIT)
    r1cs = R1CS.from_constraints(ev.signals, ev.constraints, [])
    params = generate_parameters(r1cs, tau=11, alpha=3, beta=5, gamma=7, delta=9)

    buf = io.BytesIO()
    fmt.write_pk(buf, ev.collected_asts, ev.constraints, [], params)
    buf.seek(0)
    pk = fmt.read_pk(buf)

    assert len(pk.constraints) == len(ev.constraints)
    assert str(pk.constraints.get(0)) == str(ev.constraints.get(0))
    assert pk.ignore_signals == []
    assert pk.params.vk.alpha_g1 == params.vk.alpha_g1
    assert pk.params.b_g2 == params.b_g2
    assert pk.params.domain_size == params.domain_size

    # the pk-stored ASTs re-evaluate to the same witness
    evw = Evaluator(Mode.GEN_WITNESS)
    evw.set_deferred_value("main.a", Value(FS(7)))
    evw.set_deferred_value("main.b", Value(FS(3)))
    evw.eval_asts(pk.asts)
    z = r1cs.assignment_from_signals(evw.signals)
    assert z == [1, 21, 7, 3]


def test_pk_density_filter_roundtrip():
    """Density-filtered pk (bellman Parameters layout) still proves:
    the a/b queries are stored filtered (bellman DensityTracker
    semantics) and re-expanded at prove time (setup.expand_queries)."""
    from za_tpu.groth16.prove import prove as g16_prove
    from za_tpu.groth16.setup import expand_queries
    from za_tpu.groth16.verify import verify_proof

    ev = compile_constraints(CIRCUIT)
    r1cs = R1CS.from_constraints(ev.signals, ev.constraints, [])
    params = generate_parameters(r1cs, tau=11, alpha=3, beta=5, gamma=7,
                                 delta=9)

    a_d, b_d = r1cs.densities()
    assert all(a_d[: r1cs.num_inputs])  # inputs always A-dense
    buf = io.BytesIO()
    fmt.write_pk(buf, ev.collected_asts, ev.constraints, [], params,
                 densities=(a_d, b_d))
    buf.seek(0)
    pk = fmt.read_pk(buf)
    assert len(pk.params.a) == sum(a_d)
    assert len(pk.params.b_g1) == sum(b_d)

    expanded = expand_queries(pk.params, r1cs)
    assert len(expanded.a) == r1cs.num_vars
    # non-dense slots are the identity; dense slots match the original
    for p_orig, p_exp, d in zip(params.a, expanded.a, a_d):
        assert p_exp == (p_orig if d else None)

    evw = Evaluator(Mode.GEN_WITNESS)
    evw.set_deferred_value("main.a", Value(FS(7)))
    evw.set_deferred_value("main.b", Value(FS(3)))
    evw.eval_asts(pk.asts)
    z = r1cs.assignment_from_signals(evw.signals)
    proof = g16_prove(pk.params, r1cs, z, r=4, s=6)
    assert verify_proof(pk.params.vk, proof, z[1 : r1cs.num_inputs])


def test_point_byte_encoding():
    assert fmt.g1_from_bytes(fmt.g1_to_bytes(G1_GEN)) == G1_GEN
    assert fmt.g1_from_bytes(fmt.g1_to_bytes(None)) is None
    assert fmt.g2_from_bytes(fmt.g2_to_bytes(G2_GEN)) == G2_GEN
    assert fmt.g2_from_bytes(fmt.g2_to_bytes(None)) is None
    with pytest.raises(fmt.FormatError):
        fmt.g1_from_bytes(bytes(64).replace(b"\0", b"\1", 1))


def test_flatten_json():
    inputs = fmt.flatten_json(
        "main", '{"p": "2", "arr": [1, "2"], "obj": {"x": 7}}'
    )
    d = {k: v.v for k, v in inputs}
    assert d == {"main.p": 2, "main.arr[0]": 1, "main.arr[1]": 2, "main.obj.x": 7}


def test_solidity_verifier_contains_vk():
    from za_tpu.groth16.ethereum import generate_solidity

    ev = compile_constraints(CIRCUIT)
    r1cs = R1CS.from_constraints(ev.signals, ev.constraints, [])
    params = generate_parameters(r1cs, tau=11, alpha=3, beta=5, gamma=7, delta=9)
    sol = generate_solidity(params.vk, ["main.c"])
    assert "pairingProd4" in sol
    assert str(params.vk.alpha_g1[0]) in sol
    # G2 imaginary-part-first ordering
    x = params.vk.beta_g2[0]
    assert f"[{x.c1},{x.c0}]" in sol
    assert "uint[1] memory input" in sol


def test_final_exponentiation_hard_part_chain():
    """The BN addition-chain hard part equals the plain
    (q^4-q^2+1)/r power on random Miller-loop outputs."""
    import random

    from za_tpu.curve import (
        _hard_part_bn, _hard_part_naive, g1_mul, g2_mul, miller_loop,
    )

    rng = random.Random(8)
    for _ in range(3):
        f = miller_loop(
            g2_mul(G2_GEN, rng.randrange(1, R)),
            g1_mul(G1_GEN, rng.randrange(1, R)),
        )
        t = f.conj() * f.inv()
        t = t.frob(2) * t
        assert _hard_part_bn(t) == _hard_part_naive(t)
