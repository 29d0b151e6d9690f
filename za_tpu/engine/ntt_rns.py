"""Radix-2 NTT over Fr in the RNS representation.

The limb NTT's butterflies pay ~8k VPU ops per Montgomery twiddle
multiply; in RNS (za_tpu.engine.rns) the same multiply is ~1.9k ops
with the CRT extensions on the MXU, so the h(x) pipeline -- dominated
by 7 NTTs at domain size -- drops proportionally.

Integer-bound bookkeeping (rns.py discipline): butterfly outputs
  u' = u + w*v        (bound B + 4N)
  v' = u + 8N - w*v   (bound B + 8N, via the 8N sub offset: the
                       subtrahend is always a fresh mul output < 4N)
grow by <= 8N per stage from a start of 4N, so 2^20 domains peak at
164N -- comfortably inside the 512N mont_mul contract; every twiddle
multiply resets its output to < 4N.

All values are M1-Montgomery residues (x~ = X*M1 mod r); tables are
Montgomery-form constants. Mirrors the host golden model
za_tpu.groth16.domain.Domain and the limb engine za_tpu.engine.ntt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import R
from ..groth16.domain import Domain
from . import rns as RNS
from .ntt import _bitrev_indices
from .rns import RR


def _mont_table(vals) -> np.ndarray:
    """list of Fr ints -> (35, n) Montgomery RNS residues."""
    return RR.ints_to_rns([v * RR.m1 % R for v in vals])


def _pow_list(base: int, count: int) -> list[int]:
    out = []
    acc = 1
    for _ in range(count):
        out.append(acc)
        acc = acc * base % R
    return out


class RnsDomain:
    """Twiddle/scaling tables for a 2^k domain in Montgomery RNS."""

    def __init__(self, size: int):
        self.size = size
        self.host = Domain(size)
        h = self.host
        half = max(size // 2, 1)
        self.w_fwd = jnp.asarray(_mont_table(_pow_list(h.omega, half)))
        self.w_inv = jnp.asarray(_mont_table(_pow_list(h.omega_inv, half)))
        self.size_inv = jnp.asarray(_mont_table([h.size_inv]))
        self.coset_pow = jnp.asarray(_mont_table(_pow_list(h.coset_gen, size)))
        # inverse coset scaling with 1/n folded in
        inv_scaled = []
        acc = h.size_inv
        for _ in range(size):
            inv_scaled.append(acc)
            acc = acc * h.coset_gen_inv % R
        self.coset_inv_pow = jnp.asarray(_mont_table(inv_scaled))
        self.z_coset_inv = jnp.asarray(_mont_table([h.z_coset_inv]))


def _ntt_core(x, table, n: int):
    """Stage-unrolled radix-2 NTT on (35, n) Montgomery residues."""
    x = x[:, np.asarray(_bitrev_indices(n))]
    length = 2
    while length <= n:
        half = length // 2
        stride = n // length
        tw = table[:, ::stride][:, :half]  # (35, half)
        xr = x.reshape(RNS.N_CH, n // length, length)
        u = xr[:, :, :half]
        v = xr[:, :, half:]
        twb = jnp.broadcast_to(tw[:, None, :], v.shape)
        vt = RNS.mont_mul_rns(v, twb, RR)
        x = jnp.concatenate(
            [
                RNS.ch_add(u, vt, RR),
                RNS.ch_sub_off(u, vt, RR, off_vec=RR.sub_off8),
            ],
            axis=2,
        ).reshape(RNS.N_CH, n)
        length *= 2
    return x


def _scale(x, v):
    """Elementwise Montgomery multiply by a (35, n) or (35, 1) vector
    (resets the integer bound to < 4N)."""
    return RNS.mont_mul_rns(x, jnp.broadcast_to(v, x.shape), RR)


def ntt(dom: RnsDomain, coeffs):
    return _ntt_core(coeffs, dom.w_fwd, dom.size)


def intt(dom: RnsDomain, evals):
    x = _ntt_core(evals, dom.w_inv, dom.size)
    return _scale(x, dom.size_inv)


def coset_ntt(dom: RnsDomain, coeffs):
    return _ntt_core(_scale(coeffs, dom.coset_pow), dom.w_fwd, dom.size)


def coset_intt(dom: RnsDomain, evals):
    x = _ntt_core(evals, dom.w_inv, dom.size)
    return _scale(x, dom.coset_inv_pow)


# -- compile-shared drivers (one jitted core per size, tables as args) --------

_piece_jits: dict = {}


def _core_jit(size: int):
    key = ("rns_core", size)
    fn = _piece_jits.get(key)
    if fn is None:
        fn = jax.jit(lambda x, table: _ntt_core(x, table, size))
        _piece_jits[key] = fn
    return fn


def _scale_jit():
    fn = _piece_jits.get("rns_scale")
    if fn is None:
        fn = jax.jit(_scale)
        _piece_jits["rns_scale"] = fn
    return fn


def ntt_steps(dom: RnsDomain, coeffs):
    return _core_jit(dom.size)(coeffs, dom.w_fwd)


def intt_steps(dom: RnsDomain, evals):
    x = _core_jit(dom.size)(evals, dom.w_inv)
    return _scale_jit()(x, dom.size_inv)


def coset_ntt_steps(dom: RnsDomain, coeffs):
    scaled = _scale_jit()(coeffs, dom.coset_pow)
    return _core_jit(dom.size)(scaled, dom.w_fwd)


def coset_intt_steps(dom: RnsDomain, evals):
    x = _core_jit(dom.size)(evals, dom.w_inv)
    return _scale_jit()(x, dom.coset_inv_pow)
