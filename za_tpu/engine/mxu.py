"""MXU-resident NTT: field transforms as int8 systolic-array matmuls.

Measured on TPU v5e (this pod's chip): elementwise u32 ops run at
~12 Gop/s (XLA) / ~70 Gop/s (fused Pallas), while the int8 MXU path
delivers ~50 TOP/s -- a 1000x gap. Any multiply with a FIXED operand
must therefore ride the MXU. An NTT is exactly that: a matrix of
constant twiddles times the data.

Representation: 7-bit little-endian limbs (40 per element, covering
2^280 > 4*S*r^2 lazy-reduction headroom) stored as int8. All values
carry the engine-wide Montgomery-256 interpretation (value = x*2^256
mod r, the same as za_tpu.engine.field); the MXU's own reduction
radix is R' = 2^280 and every constant is pre-scaled by 2^280 so the
data's interpretation never changes.

One NTT level over a factor S <= MAX_FACTOR is ONE int8 matmul with a
block-Toeplitz matrix BigM[(c,k),(l,j)] = digit_{c-l}(w^{jk} * 2^280):
the matmul simultaneously performs the S-point DFT contraction and
the limb-product convolution, accumulating exactly in int32
(127^2 * S * 40 < 2^31). Montgomery reduction of the resulting digit
columns is two more small fixed matmuls (by N' mod 2^280 and by r)
plus vector carry passes. Between levels values stay < 2r (lazy);
the final conditional subtraction happens after conversion back to
the 16x16-bit u32 form.

Replaces bellman_ce's CPU coset FFT (SURVEY.md section 2.3) as the
h(x) quotient engine; the four-step/unrolled VPU NTT (ntt.py) remains
as the non-MXU fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import R as FIELD_R
from ..groth16.domain import Domain
from . import field as F

NL = 40            # limbs per element
LB = 7             # bits per limb
LMASK = (1 << LB) - 1
RBITS = NL * LB    # R' = 2^280
WC = 2 * NL        # wide product columns

MAX_FACTOR = 128   # largest single-matmul NTT size

_R_PRIME = 1 << RBITS
_NP280 = (-pow(FIELD_R, -1, _R_PRIME)) % _R_PRIME  # -r^-1 mod 2^280


# -- host limb packing ---------------------------------------------------------


def int_to_l7(v: int) -> np.ndarray:
    return np.array(
        [(v >> (LB * i)) & LMASK for i in range(NL)], dtype=np.int8
    )


def ints_to_l7(vs) -> np.ndarray:
    """list of ints < 2^280 -> (40, n) int8."""
    out = np.empty((NL, len(vs)), dtype=np.int8)
    for j, v in enumerate(vs):
        for i in range(NL):
            out[i, j] = (v >> (LB * i)) & LMASK
    return out


def l7_to_int(a) -> int:
    a = np.asarray(a).astype(np.int64)
    return sum(int(a[i]) << (LB * i) for i in range(a.shape[0]))


# -- device digit <-> u16-limb conversion --------------------------------------


def u16_to_l7(x):
    """(16, ...) u32 canonical 16-bit digits -> (40, ...) int8 7-bit."""
    outs = []
    zero = jnp.zeros_like(x[0])
    for k in range(NL):
        bit = k * LB
        j, sh = bit // F.LIMB_BITS, bit % F.LIMB_BITS
        if j >= F.NLIMBS:  # beyond 256 bits: input is < 2^256
            outs.append(zero)
            continue
        v = x[j] >> sh
        if j + 1 < F.NLIMBS and sh > F.LIMB_BITS - LB:
            v = v | (x[j + 1] << (F.LIMB_BITS - sh))
        outs.append(v & LMASK)
    return jnp.stack(outs).astype(jnp.int8)


def l7_to_u16(d):
    """(40, ...) canonical 7-bit digits (i8 or i32) -> (16, ...) u32.

    The value may be up to 2^280; bits >= 256 are the caller's concern
    (lazy values are < 2r < 2^255, so nothing is lost)."""
    d = d.astype(jnp.uint32)
    outs = []
    for k in range(F.NLIMBS):
        bit = k * F.LIMB_BITS
        acc = None
        # 7-bit digits overlapping [bit, bit+16): indices floor(bit/7)..
        for i in range(bit // LB, min((bit + 15) // LB + 1, NL)):
            off = i * LB - bit
            piece = (d[i] << off) if off >= 0 else (d[i] >> (-off))
            acc = piece if acc is None else acc | piece
        outs.append(acc & F.MASK)
    return jnp.stack(outs)


# -- base-128 carry machinery --------------------------------------------------


def _shift_up(x):
    pad = [(1, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[:-1]


def carry7(cols, excess_bits: int):
    """(L, ...) int32 digit columns, each < 2^(7+excess_bits) ->
    canonical 7-bit digits. excess_bits/7 local split passes, then a
    Kogge-Stone pass for the remaining binary ripple. Top-limb carry
    must be zero (callers pick L with headroom)."""
    e = cols
    for _ in range(-(-excess_bits // LB)):
        e = (e & LMASK) + _shift_up(e >> LB)
    # digits now <= 127 + small; one more split leaves <= 128
    e = (e & LMASK) + _shift_up(e >> LB)
    L = e.shape[0]
    g = (e >> LB).astype(jnp.int32)
    p = ((e & LMASK) == LMASK).astype(jnp.int32)
    shift = 1
    while shift < L:
        gp = jnp.pad(g, [(shift, 0)] + [(0, 0)] * (g.ndim - 1))[:-shift]
        pp = jnp.pad(p, [(shift, 0)] + [(0, 0)] * (p.ndim - 1))[:-shift]
        g = g | (p & gp)
        p = p & pp
        shift *= 2
    return (e + _shift_up(g)) & LMASK


def _toeplitz_low(digits: np.ndarray, rows: int) -> np.ndarray:
    """(NL,) digits of a constant -> (rows, NL) i8 matrix computing the
    low `rows` product columns: out[c] = sum_{l} M[c, l] * x_l with
    M[c, l] = digits[c - l]."""
    m = np.zeros((rows, NL), dtype=np.int8)
    for c in range(rows):
        lo = max(0, c - (NL - 1))
        for l in range(lo, min(c, NL - 1) + 1):
            m[c, l] = digits[c - l]
    return m


# -- elementwise product in digit space (for twiddle passes) -------------------


def mul_cols(a, b):
    """(40, ...) canonical digit arrays (i8/i32) -> (80, ...) i32 wide
    product columns (each < 127^2*40 < 2^20). VPU work: 1600 mul+add
    per element -- used only for the per-position twiddle passes.
    Row-by-row accumulation: materializing the full (40, 40, ...)
    outer product is 12.5GB at n=2^20."""
    ai = a.astype(jnp.int32)
    bi = b.astype(jnp.int32)
    tail = [(0, 0)] * (ai.ndim - 1)
    cols = None
    for i in range(NL):
        row = jnp.pad(ai[i] * bi, [(i, NL - i)] + tail)  # (80, ...)
        cols = row if cols is None else cols + row
    return cols


# -- the matmul NTT ------------------------------------------------------------


def _big_matrix(vals: np.ndarray) -> np.ndarray:
    """(S, S) int matrix of field constants -> (80*S, 40*S) int8
    block-Toeplitz matmul matrix (DFT contraction x limb convolution).

    Row (c*S + k), col (l*S + j) holds digit_{c-l}(vals[k, j])."""
    S = vals.shape[0]
    digs = np.zeros((NL, S, S), dtype=np.int8)
    v = vals.astype(object)
    for i in range(NL):
        digs[i] = (v >> (LB * i) & LMASK).astype(np.int8)
    big = np.zeros((WC * S, NL * S), dtype=np.int8)
    for c in range(WC):
        for l in range(max(0, c - (NL - 1)), min(c, NL - 1) + 1):
            big[c * S : (c + 1) * S, l * S : (l + 1) * S] = digs[c - l]
    return big


_PRE = pow(2, RBITS, FIELD_R)  # constant pre-scale 2^280


def _dft_matrix(S: int, w: int, scale: int = 1) -> np.ndarray:
    """W[k, j] = w^(jk) * scale * 2^280 mod r as an object array."""
    out = np.empty((S, S), dtype=object)
    wp = [pow(w, k, FIELD_R) for k in range(S)]
    for k in range(S):
        base = wp[k]
        acc = scale * _PRE % FIELD_R
        for j in range(S):
            out[k, j] = acc
            acc = acc * base % FIELD_R
    return out


class MxuNtt:
    """Per-domain matmul-NTT plan (sizes 2^k, recursive 128-factor).

    All device arrays (block matrices, twiddles, scales, REDC
    constants) are carried in a `params` dict passed to the jitted
    entry points as an ARGUMENT -- closing over ~50MB constants makes
    XLA:TPU spend minutes in constant passes (measured 256s vs 15s)."""

    _mat_cache: dict = {}

    def __init__(self, size: int):
        self.size = size
        self.host = Domain(size)
        h = self.host
        self.params: dict = {
            "np_mat": jnp.asarray(_toeplitz_low(int_to_l7(_NP280), NL)),
            "n_mat": jnp.asarray(_toeplitz_low(int_to_l7(FIELD_R), WC)),
        }
        self.plan_fwd = self._plan("f", size, h.omega, 1)
        # inverse folds 1/n into the outermost level's matrix
        self.plan_inv = self._plan("i", size, h.omega_inv, h.size_inv)
        # coset pre/post scale vectors (digit tables)
        self.params["coset"] = self._scale_table(
            [pow(h.coset_gen, j, FIELD_R) for j in range(size)]
        )
        self.params["coset_inv"] = self._scale_table(
            [pow(h.coset_gen_inv, j, FIELD_R) for j in range(size)]
        )
        self._jits: dict = {}

    # -- plan construction -----------------------------------------------------

    def _scale_table(self, vals):
        """per-position constants c_j -> (40, n) i8 digits of c_j*2^280
        (one REDC after the elementwise product keeps interpretation)."""
        return jnp.asarray(
            ints_to_l7([v * _PRE % FIELD_R for v in vals])
        )

    def _matrix(self, S: int, w: int, scale: int):
        key = (S, w, scale)
        m = MxuNtt._mat_cache.get(key)
        if m is None:
            m = jnp.asarray(_big_matrix(_dft_matrix(S, w, scale)))
            MxuNtt._mat_cache[key] = m
        return m

    def _plan(self, tag: str, size: int, w: int, outer_scale: int):
        """Recursive four-step plan with array params stored by key:
        ('mat', S, key) for size <= MAX_FACTOR, else
        ('split', n1, n2, inner_plan, tw_key, outer_plan)."""
        if size <= MAX_FACTOR:
            key = f"m{tag}{size}"
            self.params[key] = self._matrix(size, w, outer_scale)
            return ("mat", size, key)
        n2 = MAX_FACTOR
        n1 = size // n2
        w2 = pow(w, n1, FIELD_R)   # root for the inner n2-point NTT
        w1 = pow(w, n2, FIELD_R)   # root for the outer n1-point NTT
        inner = self._plan(tag + "a", n2, w2, 1)
        outer = self._plan(tag + "b", n1, w1, outer_scale)
        # twiddle w^(j1*k2) * 2^280, laid out (40, n2, n1) [k2, j1]
        tw = np.empty((NL, n2, n1), dtype=np.int8)
        for k2 in range(n2):
            wk = pow(w, k2, FIELD_R)
            row = []
            acc = _PRE % FIELD_R
            for _ in range(n1):
                row.append(acc)
                acc = acc * wk % FIELD_R
            tw[:, k2, :] = ints_to_l7(row)
        tw_key = f"t{tag}{size}"
        self.params[tw_key] = jnp.asarray(tw)
        return ("split", n1, n2, inner, tw_key, outer)

    # -- execution (params passed explicitly; fully traceable) ------------------

    @staticmethod
    def _redc(params, cols, excess_bits: int):
        """(80, n) i32 digit columns -> (40, n) canonical digits of
        value*2^-280 mod r, result < 2r (two fixed-Toeplitz matmuls)."""
        t = carry7(cols, excess_bits)
        t8 = t.astype(jnp.int8)
        m_cols = jax.lax.dot_general(
            params["np_mat"], t8[:NL],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # m = (t mod 2^280)*N' mod 2^280; digits < 2^20
        m = carry7(m_cols, 13).astype(jnp.int8)
        mn = jax.lax.dot_general(
            params["n_mat"], m,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # m*r; u = t + m*r has zero low 280 bits
        u = carry7(mn + t, 13)
        return u[NL:]  # value < 2r

    def _apply_mat(self, params, x, S: int, key: str):
        """x: (40, B, S) canonical digits -> (40, B, S) transformed,
        value < 2r. ONE int8 matmul does DFT + limb convolution."""
        B = x.shape[1]
        xs = (
            jnp.swapaxes(x, 1, 2)  # (40, S, B)
            .reshape(NL * S, B)
            .astype(jnp.int8)
        )
        p = jax.lax.dot_general(
            params[key], xs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (80*S, B); cols < 127^2 * S * 40
        p = p.reshape(WC, S, B)
        excess = max((127 * 127 * S * NL).bit_length() - LB, 1)
        red = self._redc(params, p.reshape(WC, S * B), excess)
        return jnp.swapaxes(red.reshape(NL, S, B), 1, 2)

    def _twiddle(self, params, x, tw):
        """x: (40, B, n2, n1) canonical; tw (40, n2, n1) -> same shape,
        value < 2r (elementwise digit product + REDC)."""
        shape = x.shape
        cols = mul_cols(x, tw[:, None])
        red = self._redc(params, cols.reshape(WC, -1), 13)
        return red.reshape((NL,) + shape[1:])

    def _run(self, params, x, plan):
        """x: (40, B, size) canonical digits -> transformed, natural
        order both sides."""
        kind = plan[0]
        if kind == "mat":
            _, S, key = plan
            return self._apply_mat(params, x, S, key)
        _, n1, n2, inner, tw_key, outer = plan
        B = x.shape[1]
        # j = j1 + n1*j2: (40, B, n2, n1)
        xr = x.reshape(NL, B, n2, n1)
        a = jnp.swapaxes(xr, 2, 3).reshape(NL, B * n1, n2)
        a = self._run(params, a, inner)  # inner NTT over j2
        a = jnp.swapaxes(a.reshape(NL, B, n1, n2), 2, 3)  # (40,B,n2,n1)
        a = self._twiddle(params, a, params[tw_key])
        b = self._run(params, a.reshape(NL, B * n2, n1), outer)  # over j1
        # out[k2 + n2*k1] = b[(k2), k1]
        b = jnp.swapaxes(b.reshape(NL, B, n2, n1), 2, 3)  # (40,B,n1,n2)
        return b.reshape(NL, B, n1 * n2)

    # -- public entry points (u32 Montgomery-256 limb interface) ----------------

    def _to_l7(self, x_u32):
        return u16_to_l7(x_u32).astype(jnp.int8)[:, None]  # (40, 1, n)

    def _from_l7(self, d):
        """lazy (<2r) digits -> canonical u32 16-bit limbs (< r)."""
        x = l7_to_u16(d[:, 0])
        n = F._bshape(F.FR.mod_limbs, x)
        sub, borrow = F.sub_borrow(x, n)
        return jnp.where(borrow == 0, sub, x)

    def _entry(self, name: str):
        fn = self._jits.get(name)
        if fn is not None:
            return fn
        size = self.size

        def body(params, x_u32):
            if name == "ntt":
                return self._from_l7(
                    self._run(params, self._to_l7(x_u32), self.plan_fwd)
                )
            if name == "intt":
                return self._from_l7(
                    self._run(params, self._to_l7(x_u32), self.plan_inv)
                )
            if name == "coset_ntt":
                d = self._to_l7(x_u32)
                d = self._twiddle(
                    params,
                    d.reshape(NL, 1, 1, size),
                    params["coset"].reshape(NL, 1, size),
                ).reshape(NL, 1, size)
                return self._from_l7(self._run(params, d, self.plan_fwd))
            d = self._run(params, self._to_l7(x_u32), self.plan_inv)
            d = self._twiddle(
                params,
                d.reshape(NL, 1, 1, size),
                params["coset_inv"].reshape(NL, 1, size),
            ).reshape(NL, 1, size)
            return self._from_l7(d)

        fn = jax.jit(body)
        self._jits[name] = fn
        return fn

    def ntt(self, x_u32):
        return self._entry("ntt")(self.params, x_u32)

    def intt(self, x_u32):
        return self._entry("intt")(self.params, x_u32)

    def coset_ntt(self, x_u32):
        return self._entry("coset_ntt")(self.params, x_u32)

    def coset_intt(self, x_u32):
        return self._entry("coset_intt")(self.params, x_u32)
