"""Host algebra tests (ported from reference fs.rs/lc.rs/qeq.rs unit tests)."""

import pytest

from za_tpu.algebra import (
    FS, LC, QEQ, SIGNAL_ONE, AlgebraError, Value, eval_infix, eval_prefix,
)


# -- FS (fs.rs:370-467) ------------------------------------------------------


def test_fs_add_mul():
    one = FS.one()
    two = one + one
    three = one + one + one
    six = three * two
    assert str(one) == "1"
    assert str(two) == "2"
    assert str(three) == "3"
    assert str(six) == "6"


def test_fs_neg():
    one = FS.one()
    minus_one = -one
    assert repr(minus_one) == "-1"
    minus_two = minus_one + minus_one
    assert repr(-minus_two) == "2"


def test_fs_mod():
    assert str(FS(1012).modulo(FS(1000))) == "12"


def test_fs_shl_shr():
    assert str(FS(10).shl(FS(2))) == "40"
    assert str(FS(40).shr(FS(1))) == "20"


def test_fs_div():
    div = FS(1).div(FS(2))
    assert str(FS(6) * div) == "3"


def test_serialize_w32_wordorder():
    v = FS(int("1111111f2222222f3333333f4444444f5555555f6666666f7777777f8888888f", 16))
    assert (
        v.write_256_w32().hex()
        == "8888888f7777777f6666666f5555555f4444444f3333333f2222222f1111111f"
    )


def test_serialize_w32_padding():
    assert (
        FS(1).write_256_w32().hex()
        == "0000000100000000000000000000000000000000000000000000000000000000"
    )


def test_fs_parse():
    assert FS.parse("0xff").v == 255
    assert FS.parse("255").v == 255
    with pytest.raises(AlgebraError):
        FS.parse("zz")


# -- LC (lc.rs:147-222) ------------------------------------------------------


def test_lc_set_get_rm():
    lc = LC.zero()
    assert str(lc) == "0"
    assert lc.get(1) is None

    lc.set(1, lambda _: FS(2))
    assert str(lc) == "2s1"
    lc.set(1, lambda _: FS(3))
    assert str(lc) == "3s1"
    lc.set(2, lambda _: FS(2))
    assert str(lc) == "3s1+2s2"
    assert str(lc.get(1)) == "3"
    assert str(lc.get(2)) == "2"
    lc.rm(1)
    assert str(lc) == "2s2"
    lc.rm(2)
    assert str(lc) == "0"


def test_lc_fs_add_mul():
    one = FS.one()
    two = one + one
    lc_1s1 = LC.from_signal(1, FS.one())
    assert str(lc_1s1.add_fs(one).add_fs(one)) == "1s1+2s0"
    lc_1s1_4one = lc_1s1.add_fs(two)
    assert str(lc_1s1_4one.mul_fs(two)) == "2s1+4s0"


def test_lc_neg():
    lc_1s1 = LC.from_signal(1, FS.one())
    lc_1s2 = LC.from_signal(2, FS.one())
    lc_n1s1_1s2 = (-lc_1s1).add_lc(lc_1s2)
    assert str(lc_n1s1_1s2) == "-1s1+1s2"
    lc_1s1_n1s2 = -lc_n1s1_1s2
    assert str(lc_1s1_n1s2) == "1s1-1s2"
    assert str(lc_n1s1_1s2.add_lc(lc_1s1_n1s2)) == "0"


def test_lc_lc_add_mul():
    lc_1s1 = LC.from_signal(1, FS.one())
    lc_1s2 = LC.from_signal(2, FS.one())
    assert str(lc_1s1) == "1s1"
    assert str(lc_1s1.add_lc(lc_1s1)) == "2s1"
    lc_2s1_1s2 = lc_1s1.add_lc(lc_1s1).add_lc(lc_1s2)
    assert str(lc_2s1_1s2) == "2s1+1s2"
    assert str(lc_2s1_1s2.mul_lc(lc_1s2)) == "[2s1+1s2]*[1s2]+[ ]"


# -- QEQ (qeq.rs:145-172) ----------------------------------------------------


def test_qeq_fs_add_mul():
    one = FS.one()
    two = one + one
    lc_1s1 = LC.from_signal(1, FS.one())
    lc_1s2 = LC.from_signal(2, FS.one())
    q = lc_1s1.mul_lc(lc_1s2).add_fs(one)
    assert str(q) == "[1s1]*[1s2]+[1s0]"
    assert str(q.mul_fs(two)) == "[2s1]*[1s2]+[2s0]"


def test_qeq_neg():
    lc_1s1 = LC.from_signal(1, FS.one())
    qeq = lc_1s1.add_lc(lc_1s1).mul_lc(lc_1s1).add_lc(lc_1s1)
    assert str(-(-qeq)) == "[2s1]*[1s1]+[1s1]"


# -- Value / operators -------------------------------------------------------


def test_value_infix_promote():
    s1 = Value.from_signal(1)
    s2 = Value.from_signal(2)
    q = eval_infix(s1, "mul", s2)
    assert q.is_qeq()
    with pytest.raises(AlgebraError):
        eval_infix(q, "mul", q)
    with pytest.raises(AlgebraError):
        eval_infix(s1, "div", s2)


def test_value_try_to_signal():
    assert Value.from_signal(3).try_to_signal() == 3
    assert eval_infix(Value.from_signal(3), "mul", Value(FS(2))).try_to_signal() is None


def test_value_prefix():
    v = eval_prefix("sub", Value(FS(5)))
    assert repr(v.v) == "-5"
