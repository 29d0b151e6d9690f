"""Differential tests: fused Pallas sub-NTT prefix vs the XLA golden
path (interpret mode on the CPU backend; the same kernel code runs on
TPU under ZA_NTT_FUSED=1)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from za_tpu.curve import R  # noqa: E402
from za_tpu.engine import rns as RNS  # noqa: E402
from za_tpu.engine.ntt_rns import (  # noqa: E402
    RnsDomain,
    _mont_table,
    _pow_list,
    _sub_ntt_axis1,
)
from za_tpu.engine.rns import RR  # noqa: E402
from za_tpu.groth16.domain import Domain  # noqa: E402


def _rand_block(rng, S, L):
    """(35, S, L) Montgomery RNS residues of random field elements."""
    vals = [rng.randrange(R) * RR.m1 % R for _ in range(S * L)]
    return jnp.asarray(
        RR.ints_to_rns(vals).reshape(RNS.N_CH, S, L).astype(np.uint32)
    )


@pytest.mark.parametrize(
    "S,L",
    [
        (64, 8),
        # larger shapes trace ~S unrolled in-kernel muls: slow-marked
        pytest.param(256, 8, marks=pytest.mark.slow),
        pytest.param(1024, 8, marks=pytest.mark.slow),
    ],
)
def test_fused_prefix_matches_xla(S, L):
    """Full-fusion and partial-fusion shapes, forward and inverse
    tables, against the stage-unrolled XLA path."""
    import random

    from za_tpu.engine import pallas_ntt as PN

    rng = random.Random(11 + S)
    x = _rand_block(rng, S, L)
    sub = Domain(S)
    for base in (sub.omega, sub.omega_inv):
        table = jnp.asarray(_mont_table(_pow_list(base, max(S // 2, 1))))
        want = np.asarray(_sub_ntt_axis1(x, table, S))
        got = np.asarray(PN.sub_ntt_fused(x, table, S, interpret=True))
        # compare canonical residues (bounds may differ per path)
        pw = np.asarray(_canon(want))
        pg = np.asarray(_canon(got))
        np.testing.assert_array_equal(pw, pg)


def _canon(a):
    """Reduce (35, S, L) residues to canonical [0, p) per channel."""
    p = RR.p.reshape(RNS.N_CH, 1, 1)
    return np.asarray(a) % p


def test_fused_prefix_partial_handover(monkeypatch):
    """Force a small VMEM budget so the kernel fuses only a prefix and
    hands over to the XLA tail mid-transform."""
    import random

    from za_tpu.engine import pallas_ntt as PN

    monkeypatch.setattr(PN, "BLK_COLS_MAX", 16 * 8)  # m_fuse=16 at L=8
    S, L = 256, 8
    rng = random.Random(7)
    x = _rand_block(rng, S, L)
    sub = Domain(S)
    table = jnp.asarray(_mont_table(_pow_list(sub.omega, S // 2)))
    assert PN.pick_m_fuse(S, L) == 16
    want = np.asarray(_sub_ntt_axis1(x, table, S))
    got = np.asarray(PN.sub_ntt_fused(x, table, S, interpret=True))
    np.testing.assert_array_equal(_canon(want), _canon(got))


def test_fused_fourstep_roundtrip(monkeypatch):
    """ZA_NTT_FUSED wiring: intt(ntt(x)) == x through the four-step
    core with the fused dispatch forced on (CPU interpret mode)."""
    import random

    import za_tpu.engine.ntt_rns as NR

    monkeypatch.setattr(NR, "_FUSED", True)
    size = 1 << 12
    dom = RnsDomain.__new__(RnsDomain)
    dom.size = size
    dom.host = Domain(size)
    dom.fourstep = NR.RnsFourStep(size, dom.host.omega, dom.host.size_inv)

    rng = random.Random(3)
    vals = [rng.randrange(R) * RR.m1 % R for _ in range(size)]
    x = jnp.asarray(RR.ints_to_rns(vals).astype(np.uint32))
    y = NR.intt(dom, NR.ntt(dom, x))
    p = RR.p.reshape(RNS.N_CH, 1)
    np.testing.assert_array_equal(np.asarray(x) % p, np.asarray(y) % p)
