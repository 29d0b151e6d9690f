"""Compiled R1CS: the bridge from symbolic constraints to the prover.

Mirrors the reference CircomCircuit synthesis (prover/src/groth16/
prover.rs:46-102): variable 0 is ONE, main public inputs (in signal-id
order) are allocated as inputs, every other non-ignored signal as aux,
and each QEQ row ``a*b + c = 0`` becomes the bellman-form constraint
``a * b = -c``.

Unlike the reference, the compiled form is flat integer arrays (CSR-like
triples), ready for vectorized witness evaluation and device upload.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..algebra import FIELD_R, SignalId
from ..compiler.constraints import Constraints
from ..compiler.signals import Signals

#: sparse linear combination over variable indices: list of (var, coeff)
Row = list[tuple[int, int]]


@dataclass
class R1CS:
    """a_rows[k] . z * b_rows[k] . z = c_rows[k] . z  for all k."""

    num_inputs: int            # including ONE at index 0
    num_aux: int
    input_names: list[str]     # names of public inputs (without ONE)
    a_rows: list[Row]
    b_rows: list[Row]
    c_rows: list[Row]
    #: map signal id -> variable index (None = ignored signal)
    var_of_signal: list[Optional[int]] = field(repr=False, default_factory=list)

    @property
    def num_constraints(self) -> int:
        return len(self.a_rows)

    @property
    def num_vars(self) -> int:
        return self.num_inputs + self.num_aux

    @staticmethod
    def from_constraints(
        signals: Signals,
        constraints: Constraints,
        ignore_signals: list[SignalId],
    ) -> "R1CS":
        ignore = set(ignore_signals)
        var_of_signal: list[Optional[int]] = [None] * len(signals)
        var_of_signal[0] = 0

        input_names = []
        next_input = 1
        for n in range(1, len(signals)):
            if n in ignore:
                continue
            s = signals.get_by_id(n)
            if s.is_main_public_input():
                var_of_signal[n] = next_input
                input_names.append(s.full_name)
                next_input += 1
        num_inputs = next_input
        next_aux = num_inputs
        for n in range(1, len(signals)):
            if n in ignore or var_of_signal[n] is not None:
                continue
            var_of_signal[n] = next_aux
            next_aux += 1

        a_rows, b_rows, c_rows = [], [], []
        for k in range(len(constraints)):
            qeq = constraints.get(k)

            def conv(lc, negate=False) -> Row:
                out = []
                for s, coeff in lc.t:
                    v = var_of_signal[s]
                    if v is None:
                        raise ValueError(f"signal {s} not defined")
                    out.append(
                        (v, (FIELD_R - coeff.v) % FIELD_R if negate else coeff.v)
                    )
                return out

            a_rows.append(conv(qeq.a))
            b_rows.append(conv(qeq.b))
            c_rows.append(conv(qeq.c, negate=True))  # a*b + c = 0 -> a*b = -c

        return R1CS(
            num_inputs=num_inputs,
            num_aux=next_aux - num_inputs,
            input_names=input_names,
            a_rows=a_rows,
            b_rows=b_rows,
            c_rows=c_rows,
            var_of_signal=var_of_signal,
        )

    def assignment_from_signals(self, signals: Signals) -> list[int]:
        """Full variable assignment z (z[0] = 1) from witness signals."""
        z = [0] * self.num_vars
        z[0] = 1
        from ..algebra import FS, Value

        for n in range(1, len(signals)):
            v = self.var_of_signal[n] if n < len(self.var_of_signal) else None
            if v is None:
                continue
            s = signals.get_by_id(n)
            if s is None or s.value is None or not isinstance(s.value.v, FS):
                raise ValueError(f"signal {n} has no scalar value")
            z[v] = s.value.v.v
        return z

    def eval_constraints(self, z: list[int]) -> tuple[list[int], list[int], list[int]]:
        """Az, Bz, Cz over the constraint rows (host reference of the
        device r1cs kernel)."""

        def dot(row: Row) -> int:
            return sum(c * z[v] for v, c in row) % FIELD_R

        az = [dot(r) for r in self.a_rows]
        bz = [dot(r) for r in self.b_rows]
        cz = [dot(r) for r in self.c_rows]
        return az, bz, cz

    def is_satisfied(self, z: list[int]) -> bool:
        az, bz, cz = self.eval_constraints(z)
        return all((a * b - c) % FIELD_R == 0 for a, b, c in zip(az, bz, cz))

    def densities(self) -> tuple[list[bool], list[bool]]:
        """Per-variable A/B density bitmaps, matching bellman's
        DensityTracker semantics (bellman_ce prover/generator): a
        variable is A-dense if it appears with nonzero coefficient in
        any A row OR is an input (the generator's per-input dummy
        constraints make every input A-dense); B-dense if it appears in
        any B row. The pk's a/b query vectors store only dense entries."""
        a_d = [False] * self.num_vars
        b_d = [False] * self.num_vars
        for i in range(self.num_inputs):
            a_d[i] = True
        for row in self.a_rows:
            for var, coeff in row:
                if coeff % FIELD_R:
                    a_d[var] = True
        for row in self.b_rows:
            for var, coeff in row:
                if coeff % FIELD_R:
                    b_d[var] = True
        return a_d, b_d
