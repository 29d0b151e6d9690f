"""Radix-2 NTT over Fr on device (coefficients <-> evaluations).

Iterative Cooley-Tukey with a precomputed bit-reversal permutation and
a master twiddle table (strided per stage). All values in Montgomery
form; matches the host golden model za_tpu.groth16.domain.Domain.

Stages whose butterfly span stays inside a shard are local; the
sharded variant (za_tpu.engine.mesh) runs the four-step decomposition
with an all-to-all between the two local halves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import R
from ..groth16.domain import Domain
from . import field as F
from .field import FR


def _bitrev_indices(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def _pow_table(base: int, count: int) -> np.ndarray:
    """(16, count) Montgomery limb table of base^0..base^{count-1}."""
    vals = []
    acc = 1
    for _ in range(count):
        vals.append(FR.to_mont_int(acc))
        acc = acc * base % R
    return F.ints_to_limbs(vals)


class DeviceDomain:
    """Twiddle/scaling tables for a 2^k domain, uploaded once."""

    def __init__(self, size: int):
        self.size = size
        self.host = Domain(size)
        h = self.host
        half = max(size // 2, 1)
        self.rev = jnp.asarray(_bitrev_indices(size))
        self.w_fwd = jnp.asarray(_pow_table(h.omega, half))
        self.w_inv = jnp.asarray(_pow_table(h.omega_inv, half))
        self.size_inv = jnp.asarray(F.int_to_limbs(FR.to_mont_int(h.size_inv)))
        # coset scaling vectors (folded with 1/n for the inverse)
        self.coset_pow = jnp.asarray(_pow_table(h.coset_gen, size))
        ginv_scaled = []
        acc = h.size_inv
        for _ in range(size):
            ginv_scaled.append(FR.to_mont_int(acc))
            acc = acc * h.coset_gen_inv % R
        self.coset_inv_pow = jnp.asarray(F.ints_to_limbs(ginv_scaled))
        self.z_coset_inv = jnp.asarray(
            F.int_to_limbs(FR.to_mont_int(h.z_coset_inv))
        )


def _ntt_core(x, table, n: int):
    """x: (16, n) Montgomery values; table: (16, n/2) master twiddles."""
    x = x[:, np.asarray(_bitrev_indices(n))]
    length = 2
    while length <= n:
        half = length // 2
        stride = n // length
        tw = table[:, :: stride][:, :half]  # (16, half)
        xr = x.reshape(F.NLIMBS, n // length, length)
        u = xr[:, :, :half]
        v = xr[:, :, half:]
        twb = jnp.broadcast_to(tw[:, None, :], v.shape)
        vt = F.mont_mul(v, twb, FR)
        x = jnp.concatenate(
            [F.add_mod(u, vt, FR), F.sub_mod(u, vt, FR)], axis=2
        ).reshape(F.NLIMBS, n)
        length *= 2
    return x


def ntt(dom: DeviceDomain, coeffs):
    return _ntt_core(coeffs, dom.w_fwd, dom.size)


def intt(dom: DeviceDomain, evals):
    x = _ntt_core(evals, dom.w_inv, dom.size)
    s = jnp.broadcast_to(dom.size_inv[:, None], x.shape)
    return F.mont_mul(x, s, FR)


def coset_ntt(dom: DeviceDomain, coeffs):
    scaled = F.mont_mul(coeffs, dom.coset_pow, FR)
    return _ntt_core(scaled, dom.w_fwd, dom.size)


def coset_intt(dom: DeviceDomain, evals):
    x = _ntt_core(evals, dom.w_inv, dom.size)
    return F.mont_mul(x, dom.coset_inv_pow, FR)
