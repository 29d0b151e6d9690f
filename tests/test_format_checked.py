"""Checked deserialization + bellman Parameters golden bytes.

Spec-golden byte test for the Parameters section (mirrors
tests/test_bincode_golden.py for the AST/QEQ sections): the expected
bytes are hand-built in the test straight from the documented bellman
layout (prover/src/groth16/format.rs:223-293 writes it; bellman
Parameters::write defines it) -- uncompressed big-endian affine points,
G2 c1-before-c0, 0x40 infinity flag, u32 BE vector counts.

Subgroup rejection: BN254 G2 has a large cofactor, so on-curve points
outside the r-subgroup exist; checked deserialization
(Parameters::read(pk, true), format.rs:285) must reject them in
proofs, vks, and the pk vk-head.
"""

import io
import json
import struct

import pytest

from za_tpu.curve import (
    B2, Fq2, G1_GEN, G2_GEN, Q, R, g1_mul, g2_is_in_subgroup,
    g2_is_on_curve, g2_mul,
)
from za_tpu.groth16 import format as fmt
from za_tpu.groth16.setup import Groth16Parameters, VerifyingKey


# -- an on-curve, out-of-subgroup G2 point ------------------------------------


def _fq_sqrt(n: int):
    """sqrt in Fq (q = 3 mod 4); None if n is not a QR."""
    s = pow(n, (Q + 1) // 4, Q)
    return s if s * s % Q == n % Q else None


def _fq2_sqrt(a: Fq2):
    """Complex-method square root in Fq[i]/(i^2+1); None if non-square."""
    if a.c1 == 0:
        s = _fq_sqrt(a.c0)
        if s is not None:
            return Fq2(s, 0)
        s = _fq_sqrt(-a.c0 % Q)
        return Fq2(0, s) if s is not None else None
    norm = (a.c0 * a.c0 + a.c1 * a.c1) % Q
    t = _fq_sqrt(norm)
    if t is None:
        return None
    inv2 = pow(2, Q - 2, Q)
    for tt in (t, (-t) % Q):
        x0sq = (a.c0 + tt) * inv2 % Q
        x0 = _fq_sqrt(x0sq)
        if x0 is not None and x0 != 0:
            y = a.c1 * pow(2 * x0, Q - 2, Q) % Q
            cand = Fq2(x0, y)
            if cand.square() == a:
                return cand
    return None


def _out_of_subgroup_g2():
    """Search small x for an on-curve G2 point; a random curve point is
    outside the r-subgroup with probability 1 - 1/cofactor."""
    for k in range(1, 200):
        x = Fq2(k, 1)
        rhs = x.square() * x + B2
        y = _fq2_sqrt(rhs)
        if y is None:
            continue
        p = (x, y)
        assert g2_is_on_curve(p)
        if not g2_is_in_subgroup(p):
            return p
    raise AssertionError("no out-of-subgroup point found in range")


BAD_G2 = _out_of_subgroup_g2()


def _jstruct_g2(p):
    x, y = p
    return [[str(x.c0), str(x.c1)], [str(y.c0), str(y.c1)]]


def test_out_of_subgroup_proof_b_rejected():
    proof_json = json.dumps({
        "a": [str(G1_GEN[0]), str(G1_GEN[1])],
        "b": _jstruct_g2(BAD_G2),
        "c": [str(G1_GEN[0]), str(G1_GEN[1])],
        "public_inputs": ["1"],
    })
    with pytest.raises(fmt.FormatError, match="subgroup"):
        fmt.proof_from_json(proof_json)


def test_out_of_subgroup_vk_rejected():
    good2 = g2_mul(G2_GEN, 5)
    d = {
        "alpha_g1": [str(G1_GEN[0]), str(G1_GEN[1])],
        "beta_g1": [str(G1_GEN[0]), str(G1_GEN[1])],
        "beta_g2": _jstruct_g2(good2),
        "gamma_g2": _jstruct_g2(BAD_G2),
        "delta_g2": _jstruct_g2(good2),
        "delta_g1": [str(G1_GEN[0]), str(G1_GEN[1])],
        "ic": [],
        "input_names": [],
    }
    with pytest.raises(fmt.FormatError, match="subgroup"):
        fmt.vk_from_json(json.dumps(d))


def test_good_g2_still_accepted():
    p = g2_mul(G2_GEN, 123456789)
    assert fmt.g2_from_jstruct(_jstruct_g2(p)) == p


# -- Parameters section golden bytes ------------------------------------------


def _g1_bytes(p):
    if p is None:
        return bytes([0x40]) + bytes(63)
    return p[0].to_bytes(32, "big") + p[1].to_bytes(32, "big")


def _g2_bytes(p):
    x, y = p
    return (x.c1.to_bytes(32, "big") + x.c0.to_bytes(32, "big")
            + y.c1.to_bytes(32, "big") + y.c0.to_bytes(32, "big"))


def test_parameters_golden_bytes():
    """write_parameters emits exactly the bellman Parameters layout,
    built here by hand from the spec; read_parameters round-trips."""
    g1 = [g1_mul(G1_GEN, k) for k in range(1, 9)]
    g2 = [g2_mul(G2_GEN, k) for k in range(1, 5)]
    vk = VerifyingKey(
        alpha_g1=g1[0], beta_g1=g1[1], beta_g2=g2[0], gamma_g2=g2[1],
        delta_g1=g1[2], delta_g2=g2[2], ic=[g1[3], g1[4]],
    )
    params = Groth16Parameters(
        vk=vk,
        h=[g1[5]],                 # domain_size 2
        l=[g1[6], None],           # includes an infinity slot
        a=[g1[7], g1[0]],
        b_g1=[g1[1]],
        b_g2=[g2[3]],
        domain_size=2,
    )

    expected = b"".join([
        _g1_bytes(g1[0]), _g1_bytes(g1[1]), _g2_bytes(g2[0]),
        _g2_bytes(g2[1]), _g1_bytes(g1[2]), _g2_bytes(g2[2]),
        struct.pack(">I", 2), _g1_bytes(g1[3]), _g1_bytes(g1[4]),
        struct.pack(">I", 1), _g1_bytes(g1[5]),
        struct.pack(">I", 2), _g1_bytes(g1[6]),
        bytes([0x40]) + bytes(63),
        struct.pack(">I", 2), _g1_bytes(g1[7]), _g1_bytes(g1[0]),
        struct.pack(">I", 1), _g1_bytes(g1[1]),
        struct.pack(">I", 1), _g2_bytes(g2[3]),
    ])

    buf = io.BytesIO()
    fmt.write_parameters(buf, params)
    assert buf.getvalue() == expected

    back = fmt.read_parameters(io.BytesIO(expected))
    assert back.vk.alpha_g1 == g1[0]
    assert back.vk.delta_g2 == g2[2]
    assert back.l == [g1[6], None]
    assert back.b_g2 == [g2[3]]
    assert back.domain_size == 2


def test_pk_vk_head_out_of_subgroup_rejected():
    """A pk whose delta_g2 lies outside the r-subgroup is rejected at
    read time (vk-head points are always subgroup-checked)."""
    g1b = _g1_bytes(g1_mul(G1_GEN, 3))
    g2good = _g2_bytes(g2_mul(G2_GEN, 2))
    blob = b"".join([
        g1b, g1b, g2good, g2good, g1b, _g2_bytes(BAD_G2),
        struct.pack(">I", 0),
        struct.pack(">I", 0), struct.pack(">I", 0),
        struct.pack(">I", 0), struct.pack(">I", 0),
        struct.pack(">I", 0),
    ])
    with pytest.raises(fmt.FormatError, match="subgroup"):
        fmt.read_parameters(io.BytesIO(blob))


def test_b_g2_query_checked_mode():
    """checked=True extends the subgroup check to the b_g2 query."""
    g1b = _g1_bytes(g1_mul(G1_GEN, 3))
    g2good = _g2_bytes(g2_mul(G2_GEN, 2))
    blob = b"".join([
        g1b, g1b, g2good, g2good, g1b, g2good,
        struct.pack(">I", 0),
        struct.pack(">I", 1), _g1_bytes(None),  # h (domain_size 2)
        struct.pack(">I", 0), struct.pack(">I", 0),
        struct.pack(">I", 0),
        struct.pack(">I", 1), _g2_bytes(BAD_G2),
    ])
    fmt.read_parameters(io.BytesIO(blob))  # unchecked: accepted
    with pytest.raises(fmt.FormatError, match="subgroup"):
        fmt.read_parameters(io.BytesIO(blob), checked=True)


def test_density_filtered_golden_bytes():
    """write_parameters with densities emits EXACTLY the entries
    bellman's DensityTracker stores: a keeps inputs + A-dense vars,
    b keeps B-dense vars (format.rs / bellman parameters layout),
    verified byte-for-byte against a hand-built blob."""
    from za_tpu.groth16.r1cs import R1CS
    from za_tpu.groth16.setup import generate_parameters

    # var 3 never appears in A rows -> a-filtered; var 2 never in B
    a_rows = [[(1, 1)], [(2, 3)]]
    b_rows = [[(1, 1)], [(3, 5)]]
    c_rows = [[(2, 1)], [(3, 1)]]
    r1cs = R1CS(num_inputs=2, num_aux=2, input_names=["main.x"],
                a_rows=a_rows, b_rows=b_rows, c_rows=c_rows,
                var_of_signal=[])
    params = generate_parameters(r1cs, tau=7, alpha=3, beta=5,
                                 gamma=11, delta=13)
    a_d, b_d = r1cs.densities()
    assert a_d == [True, True, True, False]   # inputs always A-dense
    assert b_d == [False, True, False, True]

    buf = io.BytesIO()
    fmt.write_parameters(buf, params, densities=(a_d, b_d))

    vk = params.vk
    expected = b"".join([
        _g1_bytes(vk.alpha_g1), _g1_bytes(vk.beta_g1),
        _g2_bytes(vk.beta_g2), _g2_bytes(vk.gamma_g2),
        _g1_bytes(vk.delta_g1), _g2_bytes(vk.delta_g2),
        struct.pack(">I", len(vk.ic)),
        *[_g1_bytes(p) for p in vk.ic],
        struct.pack(">I", len(params.h)),
        *[_g1_bytes(p) for p in params.h],
        struct.pack(">I", len(params.l)),
        *[_g1_bytes(p) for p in params.l],
        struct.pack(">I", 3),                       # a: vars 0,1,2
        *[_g1_bytes(params.a[v]) for v in (0, 1, 2)],
        struct.pack(">I", 2),                       # b_g1: vars 1,3
        *[_g1_bytes(params.b_g1[v]) for v in (1, 3)],
        struct.pack(">I", 2),                       # b_g2: vars 1,3
        *[_g2_bytes(params.b_g2[v]) for v in (1, 3)],
    ])
    assert buf.getvalue() == expected


def test_pk_roundtrip_with_ignore_signals():
    """Full pk write/read round-trip through a real compile with
    optimizer-removed signals: the ignore_signals section survives,
    and a prove from the re-read pk verifies."""
    import os
    import tempfile

    from za_tpu.groth16 import helper
    from za_tpu.algebra import FS

    circuit = (
        "template T() {\n"
        " signal private input p;\n signal private input q;\n"
        " signal input r;\n signal s;\n"
        " s <== p * q;\n s === r;\n}\n"
        "component main = T();\n"
    )
    with tempfile.TemporaryDirectory() as d:
        circ = os.path.join(d, "circuit.za")
        with open(circ, "w") as fh:
            fh.write(circuit)
        pk_path = os.path.join(d, "proving.key")
        old = os.getcwd()
        os.chdir(d)
        try:
            vk_json = helper.setup(circ, pk_path, helper.VERIFIER_JSON)
        finally:
            os.chdir(old)
        with open(pk_path, "rb") as fh:
            pk = fmt.read_pk(fh)
        # the intermediate signal s is optimizer-substituted
        assert len(pk.ignore_signals) >= 1
        proof_json = helper.prove(
            pk_path, [("main.p", FS(2)), ("main.q", FS(3)),
                      ("main.r", FS(6))],
            deterministic_rs=(13, 17),
        )
        assert helper.verify(vk_json, proof_json)


def _pk_blob() -> bytes:
    """A minimal valid pk byte blob (1 constraint, 1 ignore id)."""
    from za_tpu.compiler import Constraints
    from za_tpu.algebra import LC, QEQ, FS
    from za_tpu.groth16.r1cs import R1CS
    from za_tpu.groth16.setup import generate_parameters

    r1cs = R1CS(num_inputs=2, num_aux=1, input_names=["main.r"],
                a_rows=[[(2, 1)]], b_rows=[[(0, 1)]],
                c_rows=[[(1, 1)]], var_of_signal=[])
    params = generate_parameters(r1cs, tau=7, alpha=3, beta=5,
                                 gamma=11, delta=13)
    cons = Constraints()
    cons.push(QEQ(LC([(2, FS(1))]), LC([(0, FS(1))]),
                  LC([(1, FS(R - 1))])), None)
    buf = io.BytesIO()
    fmt.write_pk(buf, [], cons, [3], params,
                 densities=r1cs.densities())
    return buf.getvalue()


def test_pk_every_section_truncation_rejected():
    """Truncating the pk inside ANY section raises FormatError (never
    silent garbage): asts len, constraint blobs, ignore ids, vk head,
    each query vector -- probed by cutting at a spread of offsets."""
    blob = _pk_blob()
    # whole-file parse is fine
    pk = fmt.read_pk(io.BytesIO(blob))
    assert pk.ignore_signals == [3]
    assert len(pk.constraints) == 1

    cuts = sorted({1, 3, 4, 6, 10, 16, len(blob) // 4, len(blob) // 2,
                   len(blob) - 129, len(blob) - 64, len(blob) - 1})
    for cut in cuts:
        with pytest.raises((fmt.FormatError, Exception)) as ei:
            fmt.read_pk(io.BytesIO(blob[:cut]))
        assert not isinstance(ei.value, AssertionError), cut

    for cut in cuts:  # raw-query parse must reject the same cuts
        with pytest.raises(Exception) as ei:
            fmt.read_pk(io.BytesIO(blob[:cut]), raw_queries=True)
        assert not isinstance(ei.value, AssertionError), cut


def test_pk_corrupt_point_rejected():
    """Flipping coordinate bytes inside the Parameters section makes
    a point leave the curve; both parse modes must reject it at read
    or (raw mode) at the staged curve check."""
    blob = _pk_blob()
    # vk head starts right after asts(4+0) + ncons(4) + [len+qeq] +
    # nignore(4)+1*4; find it by re-serializing the prefix
    from za_tpu.compiler import Constraints
    from za_tpu.algebra import LC, QEQ, FS

    cons = Constraints()
    cons.push(QEQ(LC([(2, FS(1))]), LC([(0, FS(1))]),
                  LC([(1, FS(R - 1))])), None)
    pre = io.BytesIO()
    import za_tpu.groth16.bincode as bincode

    ast_serial = bincode.serialize_asts([])
    pre.write(struct.pack(">I", len(ast_serial)))
    pre.write(ast_serial)
    pre.write(struct.pack(">I", 1))
    qeq = bincode.serialize_qeq(cons.get(0))
    pre.write(struct.pack(">I", len(qeq)))
    pre.write(qeq)
    pre.write(struct.pack(">I", 1))
    pre.write(struct.pack(">I", 3))
    off = len(pre.getvalue())

    bad = bytearray(blob)
    bad[off + 8] ^= 0xFF  # inside alpha_g1 x
    with pytest.raises(fmt.FormatError):
        fmt.read_pk(io.BytesIO(bytes(bad)))


def test_raw_query_parse_matches_point_parse():
    """read_parameters(raw_queries=True) + expand + to_points gives the
    same query points as the per-point parse path."""
    from za_tpu.groth16.r1cs import R1CS
    from za_tpu.groth16.setup import expand_queries, generate_parameters

    a_rows = [[(1, 1)], [(2, 3)]]
    b_rows = [[(1, 1)], [(0, 5)]]
    c_rows = [[(2, 1)], [(3, 1)]]
    r1cs = R1CS(num_inputs=2, num_aux=2, input_names=["main.x"],
                a_rows=a_rows, b_rows=b_rows, c_rows=c_rows,
                var_of_signal=[])
    params = generate_parameters(r1cs, tau=7, alpha=3, beta=5, gamma=11,
                                 delta=13)
    buf = io.BytesIO()
    fmt.write_parameters(buf, params, densities=r1cs.densities())

    plain = expand_queries(
        fmt.read_parameters(io.BytesIO(buf.getvalue())), r1cs)
    raw = expand_queries(
        fmt.read_parameters(io.BytesIO(buf.getvalue()), raw_queries=True),
        r1cs)
    assert raw.h.to_points() == plain.h
    assert raw.l.to_points() == plain.l
    assert raw.a.to_points() == plain.a
    assert raw.b_g1.to_points() == plain.b_g1
    assert raw.b_g2.to_points() == plain.b_g2
    assert raw.domain_size == plain.domain_size
