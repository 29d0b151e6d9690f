"""Optimizer test (ported from reference optimizer/mod.rs:186-233)."""

from za_tpu.algebra import FS, LC, QEQ, SIGNAL_ONE
from za_tpu.compiler.constraints import Constraints
from za_tpu.compiler.optimizer import optimize_n


def test_optimize_eq():
    cons = Constraints()
    sin, st, sk, sout = 1, 2, 3, 4

    # t <== in * 2
    qeq1 = QEQ(
        LC.zero(), LC.zero(),
        LC.from_signal(st, FS.one()).add_lc(LC.from_signal(sin, -FS(2))),
    )
    # k * 2 <== t * 4
    qeq2 = QEQ(
        LC.from_signal(SIGNAL_ONE, FS(2)),
        LC.from_signal(sk, FS.one()),
        LC.from_signal(st, -FS(4)),
    )
    # out === k
    qeq3 = QEQ(
        LC.zero(), LC.zero(),
        LC.from_signal(sout, FS.one()).add_lc(LC.from_signal(sk, -FS.one())),
    )

    cons.push(qeq1)
    cons.push(qeq2)
    cons.push(qeq3)
    opt_cons, removed = optimize_n(cons, [sin, sout])

    expected = QEQ(
        LC.zero(), LC.zero(),
        LC.from_signal(sout, FS.one()).add_lc(LC.from_signal(sin, -FS(4))),
    )
    assert removed == [st, sk]
    assert len(opt_cons) == 1
    assert str(opt_cons.get(0)) == str(expected)


def test_optimize_respects_irreducible():
    cons = Constraints()
    # [][]+[1*s1 - 1*s2] with both irreducible: kept
    qeq = QEQ(
        LC.zero(), LC.zero(),
        LC.from_signal(1, FS.one()).add_lc(LC.from_signal(2, -FS.one())),
    )
    cons.push(qeq)
    opt, removed = optimize_n(cons, [1, 2])
    assert len(opt) == 1
    assert removed == []
