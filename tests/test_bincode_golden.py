"""Byte-level golden tests for the bincode v1 wire format.

The reference embeds serde+bincode encodings in proving.key
(prover/src/groth16/format.rs:223-293). No Rust toolchain exists in
this environment and the reference repo ships no binary artifacts, so
cross-validation against reference-produced bytes is impossible; the
next-best check is encoding the serde rules INDEPENDENTLY here
(explicit struct.pack sequences built from the reference declaration
order: parser/src/ast.rs, compiler/src/algebra/{fs,lc,qeq}.rs,
num-bigint 0.2 + bincode 1.2 rules) and asserting our writer emits
exactly those bytes. This pins endianness, enum variant order, length
framing, and field order against accidental drift.
"""

import struct

from za_tpu.algebra import FS, LC, QEQ
from za_tpu.groth16 import bincode as B
from za_tpu.lang import ast as A

R_MINUS_1 = (
    21888242871839275222246405745257275088548364400416034343698204186575808495616
)


def u32(v):
    return struct.pack("<I", v)


def u64(v):
    return struct.pack("<Q", v)


def biguint(v):
    """num-bigint 0.2 BigUint: Vec<u32> of little-endian 32-bit digits."""
    digits = []
    while v:
        digits.append(v & 0xFFFFFFFF)
        v >>= 32
    return u64(len(digits)) + b"".join(u32(d) for d in digits)


def bigint(v):
    """num-bigint BigInt: (Sign {Minus=0, NoSign=1, Plus=2}, BigUint)."""
    sign = 0 if v < 0 else (1 if v == 0 else 2)
    return u32(sign) + biguint(abs(v))


def meta(start, end, attrs=()):
    """Meta {start: usize, end: usize, attrs: Attributes(Vec<String>)}."""
    out = u64(start) + u64(end) + u64(len(attrs))
    for a in attrs:
        out += u64(len(a)) + a.encode()
    return out


def test_qeq_golden_bytes():
    """QEQ {a, b, c}: LC = Vec<(usize, FS)>, FS = BigUint newtype."""
    qeq = QEQ(
        a=LC([(1, FS(3))]),
        b=LC([(0, FS(1))]),
        c=LC([(2, FS(R_MINUS_1))]),
    )
    expect = (
        u64(1) + u64(1) + biguint(3)        # a: 1 term, signal 1, FS(3)
        + u64(1) + u64(0) + biguint(1)      # b
        + u64(1) + u64(2) + biguint(R_MINUS_1)  # c: 8-digit magnitude
    )
    got = B.serialize_qeq(qeq)
    assert got == expect, f"\n got {got.hex()}\n exp {expect.hex()}"
    back = B.deserialize_qeq(got)
    assert str(back) == str(qeq)


def test_expression_golden_bytes():
    """ExpressionP::Number {meta, value} = variant 2 (ast.rs:61-90);
    InfixOp = variant 4 with Opcode::Add = variant 2 (ast.rs:198+)."""
    w = B.Writer()
    B._w_expr(w, A.ENumber(A.Meta(5, 7), 255))
    expect = u32(2) + meta(5, 7) + bigint(255)
    assert w.bytes() == expect

    w = B.Writer()
    B._w_expr(
        w,
        A.EInfixOp(
            A.Meta(0, 3),
            A.ENumber(A.Meta(0, 1), 1),
            A.Opcode.ADD,
            A.ENumber(A.Meta(2, 3), 2),
        ),
    )
    expect = (
        u32(4) + meta(0, 3)
        + u32(2) + meta(0, 1) + bigint(1)   # lhe = Number(1)
        + u32(2)                            # Opcode::Add
        + u32(2) + meta(2, 3) + bigint(2)   # rhe = Number(2)
    )
    assert w.bytes() == expect


def test_attrs_golden_bytes():
    """#[w] attribute lands in Meta.attrs as Vec<String>."""
    w = B.Writer()
    B._w_expr(w, A.ENumber(A.Meta(1, 2, ("w",)), 0))
    expect = u32(2) + meta(1, 2, ("w",)) + bigint(0)
    assert w.bytes() == expect


def test_asts_header_golden_bytes():
    """serialize_asts: bincode Vec<BodyElementP> framing -- u64 LE
    count, then elements; Include {meta, path} is variant 0
    (ast.rs:158-179)."""
    inc = A.BInclude(A.Meta(0, 12), "lib.za")
    got = B.serialize_asts([inc])
    expect = (
        u64(1)                 # Vec len
        + u32(0)               # BodyElementP::Include
        + meta(0, 12)
        + u64(6) + b"lib.za"   # path String
    )
    assert got == expect
    back = B.deserialize_asts(got)
    assert len(back) == 1
