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
