"""Pallas-fused batch-affine tree MSM levels (G1).

engine/msm_tree.py established the algorithm: signed radix-16 digit
selection from staged affine tables, then per-window binary-tree
summation with affine adds whose inversions amortize through
Montgomery's batch trick (~6 muls per add vs 14 for complete
projective RCB).  Its pure-XLA formulation measures ~225M mont muls/s
against ~900M for the fused Pallas dense kernel (HBM-bound between
ops, tools/profile_tree2.py), so the tree only wins fused.

This module fuses one TREE LEVEL as three small Mosaic kernels, run
for every level of every column-chunk under one lax.scan (each level
compiles once):

  A  (grid M, W, T): per-tile lane-chain partial products of the
     denominators x2 - x1 -- 128 independent chains per tile, one
     (35, 128) total per tile.
  N  (single cell): inversion of ALL tile totals: forward lane-chain
     scan over the concatenated totals, ONE in-kernel Fermat
     exponentiation on the final (35, 128) running product (~77 us --
     the same inversion costs ~9 ms as narrow XLA ops, which is what
     killed the per-level XLA path), backward scan emitting each
     total's inverse.
  B  (grid M, W, T): rebuilds the forward prefixes in VMEM scratch,
     walks backward to per-element denominator inverses, and applies
     the affine addition (lam = (y2-y1)/(x2-x1), x3 = lam^2-x1-x2,
     y3 = lam(x1-x3)-y1) with infinity-flag resolution; emits the
     halved level as u16 residue planes.

Both A and B reduce their (35, CW) running chains to the (35, 128)
inversion granularity with lane-halving product trees (Montgomery
association-freedom makes any bracketing equal mod N), keeping the
narrow-width mul tail logarithmic instead of linear in CW.

Pairing is FOLD-HALF (element i pairs with i + n/2) so every kernel
touches only contiguous, statically-sliced column ranges -- no
gathers, no traced reshapes (Mosaic constraints, see pallas_msm_rns).
Bound discipline follows msm_tree._level_plan exactly; the per-level
subtraction offsets arrive as a (35, 5) constant input.

The field arithmetic reuses pallas_msm_rns's kernel-side RNS library
(_KC/_kmul/_kadd/_ksub) -- bounds and Mosaic workarounds identical.

Replaces bellman_ce's multiexp (SURVEY.md section 2.3) together with
msm_tree.py as the large-n G1 MSM path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ec, msm as MSM, msm_tree as MT, rns as RNS
from . import pallas_msm_rns as PK

NCH = RNS.N_CH
WIN = MT.WIN
HALF = MT.HALF
NC = PK.N_CONST  # leading shared constant inputs
LANE = 128
IROWS = 8  # infinity-flag arrays carry 8 sublane rows (tile-aligned)
# tile columns per grid cell (per-cell VMEM at 16384 is ~13 MB)
LMAX = 16384
# batch-inversion chain width: scans step in (35, CW) slices so the
# base-extension matmuls stay wide -- at 128-wide slices the kernels
# measured 93M mont muls/s (MXU starved on (34, 128) operands). The
# per-tile stage-2 folds run as lane-halving product trees
# (_fold_tree/_unfold_inv_tree) so their narrow tail is logarithmic;
# 2048 still measures best (2^16 G1 tree: 142 ms vs 147 ms at 4096 --
# wider slices gain nothing once stage 2 is off the critical path).
import os as _os

CW = int(_os.environ.get("ZA_TREE_CW", "2048"))


# -- per-level constant offsets ----------------------------------------------


@functools.lru_cache(maxsize=None)
def _level_offs(bx: int, by: int, reset: bool,
                omul: int = 4, ynk: int = 8) -> np.ndarray:
    """(35, 6) u32 columns: den, num, x3, w, y3 subtraction offsets
    (k*N mod p per channel), mirroring msm_tree._affine_level, plus
    the level-0 y-negation offset ynk*N (8 G1 / 24 G2 -- the staged
    y-table bound) used only by the fused-select kernels.
    omul: mont-mul output bound (4 for Fq, 12 for Fq2 schoolbook)."""
    N = RNS.RQ.modulus
    ks = [bx, by, 2 * bx,
          (omul + 4) if reset else (omul + 2 * bx), by, ynk]
    return np.stack(
        [MT._off_vec(k, N) for k in ks], axis=1
    ).astype(np.uint32)


def _fermat_digits() -> np.ndarray:
    """MSB-first 4-bit windows of q-2 (first window handled apart)."""
    e = RNS.RQ.modulus - 2
    digits = []
    while e:
        digits.append(e & 15)
        e >>= 4
    digits.reverse()
    return np.array(digits, dtype=np.int32)


# -- kernel bodies ------------------------------------------------------------


def _fold_tree(run, kc, mul):
    """(rows, cw) elementwise chain product folded to (rows, LANE) by
    lane-halving.  Montgomery association-freedom: any bracketing of
    mont muls over mont-domain values yields the same value mod N (the
    M1 factors cancel identically), so this computes the sequential
    group fold's value in log2(cw/128) levels whose widths halve from
    cw -- instead of cw/128 narrow (rows, 128) muls, which starve the
    base-extension matmuls (93M muls/s at 128-wide, docs/PERF.md) and
    were the reason CW could not widen past 2048."""
    w = run.shape[1]
    while w > LANE:
        w //= 2
        run = mul(run[:, :w], run[:, w:], kc)
    return run


def _unfold_inv_tree(run_w, tinv, kc, mul):
    """Elementwise inverse of run_w (rows, cw) from the (rows, 128)
    chain inverse tinv of its folded total: rebuild the lane-halving
    product tree, then push inverses down (inv(left) = inv(parent) *
    right, inv(right) = inv(parent) * left).  Same op count as the
    sequential prefix/suffix unwind but the muls run at widths
    cw/2 .. 128 instead of all-128."""
    levels = [run_w]
    w = run_w.shape[1]
    while w > LANE:
        w //= 2
        levels.append(mul(levels[-1][:, :w], levels[-1][:, w:], kc))
    iv = tinv
    for lv in levels[-2::-1]:
        w = iv.shape[1]
        iv = jnp.concatenate(
            [mul(iv, lv[:, w:], kc), mul(iv, lv[:, :w], kc)], axis=1
        )
    return iv


def _den_slice(kc, offs, x1r, x2r, i1r, i2r, j, cw):
    """(35, cw) guarded denominator for chain-slice j."""
    sl = pl.ds(j * cw, cw)
    x1 = x1r[0, 0, :, sl].astype(jnp.uint32)
    x2 = x2r[0, 0, :, sl].astype(jnp.uint32)
    den = PK._ksub(x2, x1, kc, offs[:, 0:1])
    either = (i1r[0, 0, 0:1, sl] | i2r[0, 0, 0:1, sl]) != 0
    one = jnp.broadcast_to(kc.one, den.shape)
    return jnp.where(either, one, den)


def _a_kernel(L, cw, *refs):
    """Per-tile lane-chain products of the denominators: wide chains
    over L/cw slices, then a narrow fold of the (35, cw) running
    product to one (35, 128) total (keeps the N kernel's working set
    at cells*128 columns)."""
    kc = PK._KC(refs[:NC], False)
    offs = refs[NC][:]
    x1r, x2r, i1r, i2r = refs[NC + 1:NC + 5]
    outr = refs[NC + 5]
    run = jnp.broadcast_to(kc.one, (NCH, cw)).astype(jnp.uint32)
    for j in range(L // cw):
        run = PK._kmul(
            run, _den_slice(kc, offs, x1r, x2r, i1r, i2r, j, cw), kc
        )
    outr[0, 0] = _fold_tree(run, kc, PK._kmul)


def _n_kernel(steps, *refs):
    """Invert the concatenated per-cell totals: fwd lane-chain scan
    with prefixes staged in the out ref, one in-kernel Fermat on the
    (35, 128) grand total, bwd scan emitting inverses."""
    kc = PK._KC(refs[:NC], False)
    dig_r = refs[NC]          # (1, ndig) i32 fermat windows (SMEM)
    in_r = refs[NC + 1]       # (NCH, steps*128) u32
    out_r = refs[NC + 2]      # (NCH, steps*128) u32
    tab_r = refs[NC + 3]      # scratch (16, NCH, LANE)

    def fwd(j, run):
        sl = pl.ds(j * LANE, LANE)
        out_r[:, sl] = run            # exclusive prefix
        return PK._kmul(run, in_r[:, sl], kc)

    one = jnp.broadcast_to(kc.one, (NCH, LANE)).astype(jnp.uint32)
    total = jax.lax.fori_loop(0, steps, fwd, one)

    # Fermat x^(q-2) on (35, 128): 4-bit windows, table in scratch
    tab_r[0] = total
    for k in range(1, 16):
        tab_r[k] = PK._kmul(tab_r[k - 1], total, kc)
    ndig = dig_r.shape[1]
    d0 = dig_r[0, 0]
    acc0 = tab_r[pl.ds(d0 - 1, 1)][0]

    def fstep(i, acc):
        acc = PK._kmul(acc, acc, kc)
        acc = PK._kmul(acc, acc, kc)
        acc = PK._kmul(acc, acc, kc)
        acc = PK._kmul(acc, acc, kc)
        d = dig_r[0, i]
        t = tab_r[pl.ds(jnp.maximum(d - 1, 0), 1)][0]
        return jnp.where(d > 0, PK._kmul(acc, t, kc), acc)

    tinv = jax.lax.fori_loop(1, ndig, fstep, acc0)

    def bwd(i, carry):
        j = steps - 1 - i
        sl = pl.ds(j * LANE, LANE)
        pre = out_r[:, sl]
        t = in_r[:, sl]
        out_r[:, sl] = PK._kmul(carry, pre, kc)
        return PK._kmul(carry, t, kc)

    jax.lax.fori_loop(0, steps, bwd, tinv)


def _b_kernel(L, cw, reset, *refs):
    """Backward per-element inverses + the affine addition.

    Mirrors A's two-stage chain: wide prefixes over L/cw slices into
    scratch, the product-tree fold of the final (35, cw) run, the
    (35, 128) chain inverse from N pushed down the tree to the
    elementwise inverse of the wide run, then the wide backward walk."""
    kc = PK._KC(refs[:NC], False)
    offs = refs[NC][:]
    x1r, x2r, y1r, y2r, i1r, i2r, tinv_r = refs[NC + 1:NC + 8]
    x3r, y3r, i3r = refs[NC + 8:NC + 11]
    pre_r = refs[NC + 11]  # scratch (NCH, L) u32: wide fwd prefixes

    steps = L // cw

    def fwd(j, run):
        sl = pl.ds(j * cw, cw)
        pre_r[:, sl] = run
        return PK._kmul(
            run, _den_slice(kc, offs, x1r, x2r, i1r, i2r, j, cw), kc
        )

    one = jnp.broadcast_to(kc.one, (NCH, cw)).astype(jnp.uint32)
    run_w = jax.lax.fori_loop(0, steps, fwd, one)

    c2 = tinv_r[0, 0, 0]  # (NCH, 128): this tile's chain inverse
    carry0 = _unfold_inv_tree(run_w, c2, kc, PK._kmul)

    def bwd(i, carry):
        j = steps - 1 - i
        sl = pl.ds(j * cw, cw)
        den = _den_slice(kc, offs, x1r, x2r, i1r, i2r, j, cw)
        dinv = PK._kmul(carry, pre_r[:, sl], kc)
        carry = PK._kmul(carry, den, kc)

        x1 = x1r[0, 0, :, sl].astype(jnp.uint32)
        x2 = x2r[0, 0, :, sl].astype(jnp.uint32)
        y1 = y1r[0, 0, :, sl].astype(jnp.uint32)
        y2 = y2r[0, 0, :, sl].astype(jnp.uint32)
        i1 = i1r[0, 0, 0:1, sl]
        i2 = i2r[0, 0, 0:1, sl]

        num = PK._ksub(y2, y1, kc, offs[:, 1:2])
        lam = PK._kmul(num, dinv, kc)
        t = PK._kmul(lam, lam, kc)
        sx = PK._kadd(x1, x2, kc)
        x3 = PK._ksub(t, sx, kc, offs[:, 2:3])
        if reset:
            x3 = PK._kmul(x3, jnp.broadcast_to(kc.one, x3.shape), kc)
        w = PK._ksub(x1, x3, kc, offs[:, 3:4])
        u = PK._kmul(lam, w, kc)
        y3 = PK._ksub(u, y1, kc, offs[:, 4:5])

        b1 = i1 != 0
        b2 = i2 != 0
        x3 = jnp.where(b1, x2, jnp.where(b2, x1, x3))
        y3 = jnp.where(b1, y2, jnp.where(b2, y1, y3))
        x3r[0, 0, :, sl] = x3.astype(jnp.uint16)
        y3r[0, 0, :, sl] = y3.astype(jnp.uint16)
        i3r[0, 0, :, sl] = jnp.broadcast_to(i1 & i2, (IROWS, i1.shape[1]))
        return carry

    jax.lax.fori_loop(0, steps, bwd, carry0)


# -- level driver -------------------------------------------------------------


def _consts():
    return [jnp.asarray(a) for a in PK._consts_np(False)]


def _cspecs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * NC


def tree_level(x, y, inf, bx: int, by: int, reset: bool,
               interpret: bool = False):
    """One fold-half affine tree level.

    x, y: (M, W, 35, n) uint16; inf: (M, W, IROWS, n) uint16 flags
    (row 0 carries the flag; IROWS rows keep the tiles aligned).
    Returns the halved (x3, y3, inf3)."""
    M, W, _, n = x.shape
    half = n // 2
    L = min(LMAX, half)
    T = half // L
    assert T * L == half, (n, L)
    cw = min(CW, L)
    offs = jnp.asarray(_level_offs(bx, by, reset))
    consts = _consts()

    def tile(col_block, rows=NCH):
        return pl.BlockSpec(
            (1, 1, rows, L), lambda m, w, t, cb=col_block:
            (m, w, 0, t + cb), memory_space=pltpu.VMEM,
        )

    off_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    tot = pl.pallas_call(
        functools.partial(_a_kernel, L, cw),
        grid=(M, W, T),
        in_specs=_cspecs() + [off_spec] + [
            tile(0), tile(T), tile(0, IROWS), tile(T, IROWS)],
        out_specs=pl.BlockSpec(
            (1, 1, NCH, LANE), lambda m, w, t: (m, w, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((M, W, NCH, T * LANE),
                                       jnp.uint32),
        interpret=interpret,
    )(*consts, offs, x, x, inf, inf)

    flat = tot.transpose(2, 0, 1, 3).reshape(NCH, M * W * T * LANE)
    dig = jnp.asarray(_fermat_digits()[None])
    steps = M * W * T
    inv = pl.pallas_call(
        functools.partial(_n_kernel, steps),
        in_specs=_cspecs() + [
            # fermat digits: SMEM -- the digit loop indexes them with
            # a traced loop counter (dynamic lane indexing of VMEM
            # vectors is not lowerable)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.uint32),
        scratch_shapes=[pltpu.VMEM((16, NCH, LANE), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, dig, flat)
    invb = inv.reshape(NCH, M, W, T, LANE).transpose(1, 2, 3, 0, 4)
    # (M, W, T, NCH, 128): tile (m, w, t) reads its own chain inverse

    u16 = jnp.uint16
    x3, y3, i3 = pl.pallas_call(
        functools.partial(_b_kernel, L, cw, reset),
        grid=(M, W, T),
        in_specs=_cspecs() + [off_spec] + [
            tile(0), tile(T), tile(0), tile(T), tile(0, IROWS),
            tile(T, IROWS),
            pl.BlockSpec(
                (1, 1, 1, NCH, LANE), lambda m, w, t: (m, w, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, NCH, L), lambda m, w, t: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, NCH, L), lambda m, w, t: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, IROWS, L), lambda m, w, t: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, W, NCH, half), u16),
            jax.ShapeDtypeStruct((M, W, NCH, half), u16),
            jax.ShapeDtypeStruct((M, W, IROWS, half), u16),
        ],
        scratch_shapes=[pltpu.VMEM((NCH, L), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, offs, x, x, y, y, inf, inf, invb)
    return x3, y3, i3


# -- level 0 with in-kernel digit selection ----------------------------------
# The XLA _select_chunk materializes the (M, W, 35, S) level-0 state
# through HBM (x + y + flags ~ 5x the table bytes at W=64) and the A/B
# kernels read it back.  These variants select digits INSIDE the level
# kernels instead: the grid iterates windows innermost so each (8, 35,
# L) table tile is fetched once per (m, t) and stays VMEM-resident
# across all W windows (Pallas elides the copy when the block index is
# unchanged between consecutive grid steps).


def _digits0(dr, sl):
    """Digit slice: dr (1, 1, L) int8 ref -> ((1, cw) i32, |.|)."""
    a = dr[0, 0:1, sl].astype(jnp.int32)
    return a, jnp.abs(a)


def _kseltab(tabr, ad, sl):
    """Select the |digit| multiple from a table tile: tabr
    (1, 8, 35, L) u16 ref, ad (1, cw) i32 -> (35, cw) u32.  Digit 0
    defaults to multiple 1 (the caller flags those lanes at infinity
    -- identical to _select_chunk's where-chain)."""
    sel = tabr[0, 0, :, sl].astype(jnp.uint32)
    for k in range(2, HALF + 1):
        sel = jnp.where(
            ad == k, tabr[0, k - 1, :, sl].astype(jnp.uint32), sel
        )
    return sel


def _den0_slice(kc, offs, tx1, tx2, d1, d2, j, cw):
    """(35, cw) guarded level-0 denominator with in-kernel select."""
    sl = pl.ds(j * cw, cw)
    _, ad1 = _digits0(d1, sl)
    _, ad2 = _digits0(d2, sl)
    x1 = _kseltab(tx1, ad1, sl)
    x2 = _kseltab(tx2, ad2, sl)
    den = PK._ksub(x2, x1, kc, offs[:, 0:1])
    either = (ad1 == 0) | (ad2 == 0)
    one = jnp.broadcast_to(kc.one, den.shape)
    return jnp.where(either, one, den)


def _a0_kernel(L, cw, *refs):
    """Kernel A with fused level-0 selection (table + digit inputs)."""
    kc = PK._KC(refs[:NC], False)
    offs = refs[NC][:]
    tx1, tx2, d1, d2 = refs[NC + 1:NC + 5]
    outr = refs[NC + 5]
    run = jnp.broadcast_to(kc.one, (NCH, cw)).astype(jnp.uint32)
    for j in range(L // cw):
        run = PK._kmul(
            run, _den0_slice(kc, offs, tx1, tx2, d1, d2, j, cw), kc
        )
    outr[0, 0] = _fold_tree(run, kc, PK._kmul)


def _sel0_pair(kc, offs, tx1, tx2, ty1, ty2, d1, d2, j, cw):
    """Both selected operands of slice j: x1, x2, y1, y2 (35, cw) u32
    with the digit sign applied to y, plus the infinity masks."""
    sl = pl.ds(j * cw, cw)
    a1, ad1 = _digits0(d1, sl)
    a2, ad2 = _digits0(d2, sl)
    x1 = _kseltab(tx1, ad1, sl)
    x2 = _kseltab(tx2, ad2, sl)
    y1 = _kseltab(ty1, ad1, sl)
    y2 = _kseltab(ty2, ad2, sl)
    z = jnp.zeros_like(y1)
    y1 = jnp.where(a1 < 0, PK._ksub(z, y1, kc, offs[:, 5:6]), y1)
    y2 = jnp.where(a2 < 0, PK._ksub(z, y2, kc, offs[:, 5:6]), y2)
    return x1, x2, y1, y2, ad1 == 0, ad2 == 0


def _b0_kernel(L, cw, reset, *refs):
    """Kernel B with fused level-0 selection (mirrors _b_kernel)."""
    kc = PK._KC(refs[:NC], False)
    offs = refs[NC][:]
    tx1, tx2, ty1, ty2, d1, d2, tinv_r = refs[NC + 1:NC + 8]
    x3r, y3r, i3r = refs[NC + 8:NC + 11]
    pre_r = refs[NC + 11]

    steps = L // cw

    def fwd(j, run):
        sl = pl.ds(j * cw, cw)
        pre_r[:, sl] = run
        return PK._kmul(
            run, _den0_slice(kc, offs, tx1, tx2, d1, d2, j, cw), kc
        )

    one = jnp.broadcast_to(kc.one, (NCH, cw)).astype(jnp.uint32)
    run_w = jax.lax.fori_loop(0, steps, fwd, one)

    carry0 = _unfold_inv_tree(run_w, tinv_r[0, 0, 0], kc, PK._kmul)

    def bwd(i, carry):
        j = steps - 1 - i
        sl = pl.ds(j * cw, cw)
        x1, x2, y1, y2, b1, b2 = _sel0_pair(
            kc, offs, tx1, tx2, ty1, ty2, d1, d2, j, cw
        )
        den = PK._ksub(x2, x1, kc, offs[:, 0:1])
        den = jnp.where(
            b1 | b2, jnp.broadcast_to(kc.one, den.shape), den
        )
        dinv = PK._kmul(carry, pre_r[:, sl], kc)
        carry = PK._kmul(carry, den, kc)

        num = PK._ksub(y2, y1, kc, offs[:, 1:2])
        lam = PK._kmul(num, dinv, kc)
        t = PK._kmul(lam, lam, kc)
        sx = PK._kadd(x1, x2, kc)
        x3 = PK._ksub(t, sx, kc, offs[:, 2:3])
        if reset:
            x3 = PK._kmul(x3, jnp.broadcast_to(kc.one, x3.shape), kc)
        w = PK._ksub(x1, x3, kc, offs[:, 3:4])
        u = PK._kmul(lam, w, kc)
        y3 = PK._ksub(u, y1, kc, offs[:, 4:5])

        x3 = jnp.where(b1, x2, jnp.where(b2, x1, x3))
        y3 = jnp.where(b1, y2, jnp.where(b2, y1, y3))
        x3r[0, 0, :, sl] = x3.astype(jnp.uint16)
        y3r[0, 0, :, sl] = y3.astype(jnp.uint16)
        i3r[0, 0, :, sl] = jnp.broadcast_to(
            (b1 & b2).astype(jnp.uint16), (IROWS, x3.shape[1])
        )
        return carry

    jax.lax.fori_loop(0, steps, bwd, carry0)


def tree_level0_fused(tabx, taby, d, bx: int, by: int, reset: bool,
                      interpret: bool = False):
    """Level 0 fused with digit selection.

    tabx, taby: (8, 35, M, S) u16 chunk tables; d: (W, M, S) int8
    signed digits (identity columns pre-zeroed by mask_ident_digits).
    Returns the halved (x3, y3, inf3) -- bit-identical to
    tree_level(_select_chunk(...)) without the (M, W, 35, S) HBM
    round-trip."""
    Wn, M, S = d.shape
    half = S // 2
    L = min(LMAX, half)
    T = half // L
    assert T * L == half, (S, L)
    cw = min(CW, L)
    offs = jnp.asarray(_level_offs(bx, by, reset))
    consts = _consts()
    off_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    # Mosaic block constraint: the last two block dims must be
    # (multiple-of-8, multiple-of-128) or full -- so the query axis
    # moves to the front ((M, 8, 35, S), a ~table-sized pass, vs the
    # 2x(W/8)-larger level-0 select materialization this kernel
    # replaces) and digits flatten to (W*M, 1, S).
    tabx = jnp.moveaxis(tabx, 2, 0)
    taby = jnp.moveaxis(taby, 2, 0)
    d = d.reshape(Wn * M, 1, S)

    def tabtile(col_block):
        return pl.BlockSpec(
            (1, HALF, NCH, L), lambda m, t, w, cb=col_block:
            (m, 0, 0, t + cb), memory_space=pltpu.VMEM,
        )

    def dtile(col_block):
        return pl.BlockSpec(
            (1, 1, L), lambda m, t, w, cb=col_block:
            (w * M + m, 0, t + cb), memory_space=pltpu.VMEM,
        )

    tot = pl.pallas_call(
        functools.partial(_a0_kernel, L, cw),
        grid=(M, T, Wn),
        in_specs=_cspecs() + [off_spec] + [
            tabtile(0), tabtile(T), dtile(0), dtile(T)],
        out_specs=pl.BlockSpec(
            (1, 1, NCH, LANE), lambda m, t, w: (m, w, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((M, Wn, NCH, T * LANE),
                                       jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, offs, tabx, tabx, d, d)

    flat = tot.transpose(2, 0, 1, 3).reshape(NCH, M * Wn * T * LANE)
    dig = jnp.asarray(_fermat_digits()[None])
    steps = M * Wn * T
    inv = pl.pallas_call(
        functools.partial(_n_kernel, steps),
        in_specs=_cspecs() + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.uint32),
        scratch_shapes=[pltpu.VMEM((16, NCH, LANE), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, dig, flat)
    invb = inv.reshape(NCH, M, Wn, T, LANE).transpose(1, 2, 3, 0, 4)

    u16 = jnp.uint16
    x3, y3, i3 = pl.pallas_call(
        functools.partial(_b0_kernel, L, cw, reset),
        grid=(M, T, Wn),
        in_specs=_cspecs() + [off_spec] + [
            tabtile(0), tabtile(T), tabtile(0), tabtile(T),
            dtile(0), dtile(T),
            pl.BlockSpec(
                (1, 1, 1, NCH, LANE), lambda m, t, w: (m, w, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, NCH, L), lambda m, t, w: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, NCH, L), lambda m, t, w: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, IROWS, L), lambda m, t, w: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, Wn, NCH, half), u16),
            jax.ShapeDtypeStruct((M, Wn, NCH, half), u16),
            jax.ShapeDtypeStruct((M, Wn, IROWS, half), u16),
        ],
        scratch_shapes=[pltpu.VMEM((NCH, L), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, offs, tabx, tabx, taby, taby, d, d, invb)
    return x3, y3, i3


# -- selection + full-chunk pipeline -----------------------------------------


def _select_chunk(tabx, taby, d):
    """XLA digit selection into the kernel level-0 state.

    tabx/taby: (8, 35, M, S) u16; d: (W, M, S) int8 ->
    x, y, inf: (M, W, 35, S) u16."""
    ctx = RNS.RQ
    ad = jnp.abs(d.astype(jnp.int32))       # (W, M, S)
    admw = jnp.moveaxis(ad, 0, 1)[:, :, None, :]   # (M, W, 1, S)

    def pick(tab):
        t = jnp.moveaxis(tab.astype(jnp.uint32), 2, 1)  # (8, M, 35, S)
        exp = t[:, :, None]                  # (8, M, 1, 35, S)
        sel = exp[0]                         # broadcasts up in the wheres
        for k in range(2, HALF + 1):
            sel = jnp.where(admw == k, exp[k - 1], sel)
        return sel                           # (M, W, 35, S)

    sx = pick(tabx)
    sy = pick(taby)
    neg = jnp.moveaxis(d, 0, 1)[:, :, None, :] < 0
    off8 = MT._off_vec(8, ctx.modulus)
    p = ctx.p
    yn = jnp.asarray(off8)[None, None, :, None] + \
        jnp.asarray(p)[None, None, :, None] - sy
    yn = jnp.where(yn >= jnp.asarray(p)[None, None, :, None],
                   yn - jnp.asarray(p)[None, None, :, None], yn)
    sy = jnp.where(neg, yn, sy)
    inf = jnp.broadcast_to(
        admw == 0, sx.shape[:2] + (IROWS, sx.shape[3])
    )
    return (sx.astype(jnp.uint16), sy.astype(jnp.uint16),
            inf.astype(jnp.uint16))


def tree_window_sums_fused(tables: MT.AffineTables, scalars, ops,
                           interpret: bool = False,
                           min_kernel: int = 128):
    """Pre-Horner per-window sums of the fused G1 tree MSM (leaves
    (35, W, M) projective); the sharded path reduces these across
    chips before the Horner combine."""
    assert not tables.is_g2, "fused tree path is G1 (G2: dense kernel)"
    C, S, M = tables.chunks, tables.chunk_cols, tables.m
    n_pad = C * S
    plan = MT._level_plan(max(S.bit_length() - 1, 1), False)

    if scalars.shape[-1] < n_pad:
        scalars = jnp.pad(
            scalars, ((0, 0),) * (scalars.ndim - 1)
            + ((0, n_pad - scalars.shape[-1]),)
        )
    d = MSM.signed_digits(scalars, 4).astype(jnp.int8)
    d = jnp.moveaxis(d.reshape(WIN, M, C, S), 2, 0)  # (C, W, M, S)
    d = MT.mask_ident_digits(d, tables.ident)

    # tables arrive (C, 8, 35, M, S)
    tail = max(min_kernel, 128)  # kernels need >= 128 pair columns

    def chunk_partials(tabx, taby, dg):
        lvl = 0
        n_k = S
        if n_k > tail:
            # level 0 selects digits inside the kernels (no (M, W,
            # 35, S) HBM round-trip; tables stay VMEM-resident
            # across the W windows)
            bx, by, reset = plan[0]
            x, y, inf = tree_level0_fused(tabx, taby, dg, bx, by,
                                          reset, interpret=interpret)
            n_k //= 2
            lvl = 1
        else:
            x, y, inf = _select_chunk(tabx, taby, dg)
        while n_k > tail:
            bx, by, reset = plan[lvl]
            x, y, inf = tree_level(x, y, inf, bx, by, reset,
                                   interpret=interpret)
            n_k //= 2
            lvl += 1
        # remaining per-window partials go projective (no narrow XLA
        # batch inversions -- those cost ~10 ms each in dispatch-priced
        # ops, the reason the XLA tree lost)
        fld = MT.FqAdapter()
        xc = jnp.moveaxis(x, 2, 0).astype(jnp.uint32)  # (35, M, W, n_k)
        yc = jnp.moveaxis(y, 2, 0).astype(jnp.uint32)
        ic = inf[:, :, 0, :] != 0                      # (M, W, n_k)
        return MT._proj_of_affine(xc, yc, ic, fld, ops)

    def scan_body(carry, xs):
        tabx, taby, dg = xs
        part = chunk_partials(tabx, taby, dg)
        return ec.point_add(carry, part, ops), None

    first = chunk_partials(tables.tx[0], tables.ty[0], d[0])
    if C > 1:
        acc, _ = jax.lax.scan(
            scan_body, first, (tables.tx[1:], tables.ty[1:], d[1:])
        )
    else:
        acc = first

    T = min(S, tail)
    if T > 1:
        acc = MSM.lane_fold(acc, ops, T)
    else:
        acc = jax.tree_util.tree_map(lambda a: a[..., 0], acc)
    return jax.tree_util.tree_map(
        lambda a: jnp.swapaxes(a, -1, -2), acc
    )


def msm_tree_fused(tables: MT.AffineTables, scalars, ops,
                   interpret: bool = False, min_kernel: int = 128):
    """M same-size G1 MSMs with Pallas-fused affine tree levels.

    tables: chunked u16 affine tables (msm_tree.AffineTables, G1)
    scalars: (16, M, n_pad) u32 plain-form limbs
    Returns (X, Y, Z) leaves (35, M) -- same contract as
    msm_signed_dense."""
    wsum = tree_window_sums_fused(tables, scalars, ops, interpret,
                                  min_kernel)
    return MSM.horner_windows(wsum, ops, False, 4)


# -- G2: flat-Fq2 level kernels ----------------------------------------------
# A G2 coordinate is 70 channel rows: rows [0, 35) = c0, [35, 70) = c1
# (component stacking on the SUBLANE axis keeps every block a plain
# (rows, L) tile; a trailing component axis would make (2, L) minor
# tiles).  Field product is SCHOOLBOOK (4 mont muls; Karatsuba's
# operand sums would leave the 512N contract at the tree's den bounds,
# see msm_tree._level_plan(is_g2=True)); inversion tails use the norm
# map (one Fq Fermat).

NROW2 = 2 * NCH
OMUL2 = 12  # fq2 schoolbook mul output component bound


def _f2_split(a):
    return a[:NCH], a[NCH:]


def _f2_cat(c0, c1):
    return jnp.concatenate([c0, c1], axis=0)


def _f2_mul(a, b, kc):
    a0, a1 = _f2_split(a)
    b0, b1 = _f2_split(b)
    t0 = PK._kmul(a0, b0, kc)
    t1 = PK._kmul(a1, b1, kc)
    t2 = PK._kmul(a0, b1, kc)
    t3 = PK._kmul(a1, b0, kc)
    c0 = PK._ksub(t0, t1, kc, kc.sub8)
    c1 = PK._kadd(t2, t3, kc)
    return _f2_cat(c0, c1)


def _f2_sub(a, b, kc, off):
    a0, a1 = _f2_split(a)
    b0, b1 = _f2_split(b)
    return _f2_cat(PK._ksub(a0, b0, kc, off), PK._ksub(a1, b1, kc, off))


def _f2_add(a, b, kc):
    a0, a1 = _f2_split(a)
    b0, b1 = _f2_split(b)
    return _f2_cat(PK._kadd(a0, b0, kc), PK._kadd(a1, b1, kc))


def _f2_one(kc, width):
    one = jnp.broadcast_to(kc.one, (NCH, width)).astype(jnp.uint32)
    return _f2_cat(one, jnp.zeros_like(one))


def _f2_fermat(total, kc, dig_r, tab_r):
    """(70, 128) -> inverse via the norm map: (a+bi)^-1 =
    (a - bi) / (a^2 + b^2); Fq Fermat on the norm with the shared
    digit table."""
    a0, a1 = _f2_split(total)
    n0 = PK._kmul(a0, a0, kc)
    n1 = PK._kmul(a1, a1, kc)
    norm = PK._kadd(n0, n1, kc)

    tab_r[0] = norm
    for k in range(1, 16):
        tab_r[k] = PK._kmul(tab_r[k - 1], norm, kc)
    ndig = dig_r.shape[1]
    acc0 = tab_r[pl.ds(dig_r[0, 0] - 1, 1)][0]

    def fstep(i, acc):
        acc = PK._kmul(acc, acc, kc)
        acc = PK._kmul(acc, acc, kc)
        acc = PK._kmul(acc, acc, kc)
        acc = PK._kmul(acc, acc, kc)
        d = dig_r[0, i]
        t = tab_r[pl.ds(jnp.maximum(d - 1, 0), 1)][0]
        return jnp.where(d > 0, PK._kmul(acc, t, kc), acc)

    ninv = jax.lax.fori_loop(1, ndig, fstep, acc0)
    c0 = PK._kmul(a0, ninv, kc)
    c1 = PK._kmul(a1, ninv, kc)
    c1 = PK._ksub(jnp.zeros_like(c1), c1, kc, kc.sub8)
    return _f2_cat(c0, c1)


def _den2_slice(kc, offs, x1r, x2r, i1r, i2r, j, cw):
    sl = pl.ds(j * cw, cw)
    x1 = x1r[0, 0, :, sl].astype(jnp.uint32)
    x2 = x2r[0, 0, :, sl].astype(jnp.uint32)
    den = _f2_sub(x2, x1, kc, offs[:, 0:1])
    either = (i1r[0, 0, 0:1, sl] | i2r[0, 0, 0:1, sl]) != 0
    return jnp.where(either, _f2_one(kc, cw), den)


def _a2_kernel(L, cw, *refs):
    kc = PK._KC(refs[:NC], False)
    offs = refs[NC][:]
    x1r, x2r, i1r, i2r = refs[NC + 1:NC + 5]
    outr = refs[NC + 5]
    run = _f2_one(kc, cw)
    for j in range(L // cw):
        run = _f2_mul(
            run, _den2_slice(kc, offs, x1r, x2r, i1r, i2r, j, cw), kc
        )
    outr[0, 0] = _fold_tree(run, kc, _f2_mul)


def _n2_kernel(steps, *refs):
    kc = PK._KC(refs[:NC], False)
    dig_r = refs[NC]
    in_r = refs[NC + 1]       # (70, steps*128)
    out_r = refs[NC + 2]
    tab_r = refs[NC + 3]      # scratch (16, NCH, LANE)

    def fwd(j, run):
        sl = pl.ds(j * LANE, LANE)
        out_r[:, sl] = run
        return _f2_mul(run, in_r[:, sl], kc)

    total = jax.lax.fori_loop(0, steps, fwd, _f2_one(kc, LANE))
    tinv = _f2_fermat(total, kc, dig_r, tab_r)

    def bwd(i, carry):
        j = steps - 1 - i
        sl = pl.ds(j * LANE, LANE)
        pre = out_r[:, sl]
        t = in_r[:, sl]
        out_r[:, sl] = _f2_mul(carry, pre, kc)
        return _f2_mul(carry, t, kc)

    jax.lax.fori_loop(0, steps, bwd, tinv)


def _b2_kernel(L, cw, reset, *refs):
    kc = PK._KC(refs[:NC], False)
    offs = refs[NC][:]
    x1r, x2r, y1r, y2r, i1r, i2r, tinv_r = refs[NC + 1:NC + 8]
    x3r, y3r, i3r = refs[NC + 8:NC + 11]
    pre_r = refs[NC + 11]  # scratch (70, L)

    steps = L // cw

    def fwd(j, run):
        sl = pl.ds(j * cw, cw)
        pre_r[:, sl] = run
        return _f2_mul(
            run, _den2_slice(kc, offs, x1r, x2r, i1r, i2r, j, cw), kc
        )

    run_w = jax.lax.fori_loop(0, steps, fwd, _f2_one(kc, cw))

    carry0 = _unfold_inv_tree(run_w, tinv_r[0, 0, 0], kc, _f2_mul)

    def bwd(i, carry):
        j = steps - 1 - i
        sl = pl.ds(j * cw, cw)
        den = _den2_slice(kc, offs, x1r, x2r, i1r, i2r, j, cw)
        dinv = _f2_mul(carry, pre_r[:, sl], kc)
        carry = _f2_mul(carry, den, kc)

        x1 = x1r[0, 0, :, sl].astype(jnp.uint32)
        x2 = x2r[0, 0, :, sl].astype(jnp.uint32)
        y1 = y1r[0, 0, :, sl].astype(jnp.uint32)
        y2 = y2r[0, 0, :, sl].astype(jnp.uint32)
        i1 = i1r[0, 0, 0:1, sl]
        i2 = i2r[0, 0, 0:1, sl]

        num = _f2_sub(y2, y1, kc, offs[:, 1:2])
        lam = _f2_mul(num, dinv, kc)
        t = _f2_mul(lam, lam, kc)
        sx = _f2_add(x1, x2, kc)
        x3 = _f2_sub(t, sx, kc, offs[:, 2:3])
        if reset:
            x3 = _f2_mul(x3, _f2_one(kc, x3.shape[1]), kc)
        w = _f2_sub(x1, x3, kc, offs[:, 3:4])
        u = _f2_mul(lam, w, kc)
        y3 = _f2_sub(u, y1, kc, offs[:, 4:5])

        b1 = i1 != 0
        b2 = i2 != 0
        x3 = jnp.where(b1, x2, jnp.where(b2, x1, x3))
        y3 = jnp.where(b1, y2, jnp.where(b2, y1, y3))
        x3r[0, 0, :, sl] = x3.astype(jnp.uint16)
        y3r[0, 0, :, sl] = y3.astype(jnp.uint16)
        i3r[0, 0, :, sl] = jnp.broadcast_to(i1 & i2,
                                            (IROWS, i1.shape[1]))
        return carry

    jax.lax.fori_loop(0, steps, bwd, carry0)


LMAX2 = 8192  # G2 tile columns (70-row planes double the VMEM)


def tree_level_g2(x, y, inf, bx: int, by: int, reset: bool,
                  interpret: bool = False):
    """One fold-half affine tree level over flat-Fq2 state.

    x, y: (M, W, 70, n) uint16 (rows [0,35) = c0, [35,70) = c1);
    inf: (M, W, IROWS, n) uint16."""
    M, W, _, n = x.shape
    half = n // 2
    L = min(LMAX2, half)
    T = half // L
    assert T * L == half, (n, L)
    cw = min(CW, L)
    offs = jnp.asarray(_level_offs(bx, by, reset, OMUL2))
    consts = _consts()

    def tile(col_block, rows=NROW2):
        return pl.BlockSpec(
            (1, 1, rows, L), lambda m, w, t, cb=col_block:
            (m, w, 0, t + cb), memory_space=pltpu.VMEM,
        )

    off_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    tot = pl.pallas_call(
        functools.partial(_a2_kernel, L, cw),
        grid=(M, W, T),
        in_specs=_cspecs() + [off_spec] + [
            tile(0), tile(T), tile(0, IROWS), tile(T, IROWS)],
        out_specs=pl.BlockSpec(
            (1, 1, NROW2, LANE), lambda m, w, t: (m, w, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((M, W, NROW2, T * LANE),
                                       jnp.uint32),
        interpret=interpret,
    )(*consts, offs, x, x, inf, inf)

    flat = tot.transpose(2, 0, 1, 3).reshape(NROW2, M * W * T * LANE)
    dig = jnp.asarray(_fermat_digits()[None])
    steps = M * W * T
    inv = pl.pallas_call(
        functools.partial(_n2_kernel, steps),
        in_specs=_cspecs() + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.uint32),
        scratch_shapes=[pltpu.VMEM((16, NCH, LANE), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, dig, flat)
    invb = inv.reshape(NROW2, M, W, T, LANE).transpose(1, 2, 3, 0, 4)

    u16 = jnp.uint16
    x3, y3, i3 = pl.pallas_call(
        functools.partial(_b2_kernel, L, cw, reset),
        grid=(M, W, T),
        in_specs=_cspecs() + [off_spec] + [
            tile(0), tile(T), tile(0), tile(T), tile(0, IROWS),
            tile(T, IROWS),
            pl.BlockSpec(
                (1, 1, 1, NROW2, LANE),
                lambda m, w, t: (m, w, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, NROW2, L), lambda m, w, t: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, NROW2, L), lambda m, w, t: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, IROWS, L), lambda m, w, t: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, W, NROW2, half), u16),
            jax.ShapeDtypeStruct((M, W, NROW2, half), u16),
            jax.ShapeDtypeStruct((M, W, IROWS, half), u16),
        ],
        scratch_shapes=[pltpu.VMEM((NROW2, L), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, offs, x, x, y, y, inf, inf, invb)
    return x3, y3, i3


# -- G2 level 0 with in-kernel digit selection --------------------------------


def _kseltab2(tabr, ad, sl):
    """Select the |digit| multiple from a G2 table tile: tabr
    (1, 8, 70, L) u16 ref (flat-Fq2 rows: c0 then c1), ad (1, cw)
    i32 -> flat-Fq2 (70, cw)."""
    sel = tabr[0, 0, :, sl].astype(jnp.uint32)
    for k in range(2, HALF + 1):
        sel = jnp.where(
            ad == k, tabr[0, k - 1, :, sl].astype(jnp.uint32), sel
        )
    return sel


def _den20_slice(kc, offs, tx1, tx2, d1, d2, j, cw):
    sl = pl.ds(j * cw, cw)
    _, ad1 = _digits0(d1, sl)
    _, ad2 = _digits0(d2, sl)
    x1 = _kseltab2(tx1, ad1, sl)
    x2 = _kseltab2(tx2, ad2, sl)
    den = _f2_sub(x2, x1, kc, offs[:, 0:1])
    either = (ad1 == 0) | (ad2 == 0)
    return jnp.where(either, _f2_one(kc, cw), den)


def _a20_kernel(L, cw, *refs):
    kc = PK._KC(refs[:NC], False)
    offs = refs[NC][:]
    tx1, tx2, d1, d2 = refs[NC + 1:NC + 5]
    outr = refs[NC + 5]
    run = _f2_one(kc, cw)
    for j in range(L // cw):
        run = _f2_mul(
            run, _den20_slice(kc, offs, tx1, tx2, d1, d2, j, cw), kc
        )
    outr[0, 0] = _fold_tree(run, kc, _f2_mul)


def _sel20_pair(kc, offs, tx1, tx2, ty1, ty2, d1, d2, j, cw):
    sl = pl.ds(j * cw, cw)
    a1, ad1 = _digits0(d1, sl)
    a2, ad2 = _digits0(d2, sl)
    x1 = _kseltab2(tx1, ad1, sl)
    x2 = _kseltab2(tx2, ad2, sl)
    y1 = _kseltab2(ty1, ad1, sl)
    y2 = _kseltab2(ty2, ad2, sl)
    z = jnp.zeros_like(y1)
    y1 = jnp.where(a1 < 0, _f2_sub(z, y1, kc, offs[:, 5:6]), y1)
    y2 = jnp.where(a2 < 0, _f2_sub(z, y2, kc, offs[:, 5:6]), y2)
    return x1, x2, y1, y2, ad1 == 0, ad2 == 0


def _b20_kernel(L, cw, reset, *refs):
    kc = PK._KC(refs[:NC], False)
    offs = refs[NC][:]
    tx1, tx2, ty1, ty2, d1, d2, tinv_r = refs[NC + 1:NC + 8]
    x3r, y3r, i3r = refs[NC + 8:NC + 11]
    pre_r = refs[NC + 11]

    steps = L // cw

    def fwd(j, run):
        sl = pl.ds(j * cw, cw)
        pre_r[:, sl] = run
        return _f2_mul(
            run, _den20_slice(kc, offs, tx1, tx2, d1, d2, j, cw), kc
        )

    run_w = jax.lax.fori_loop(0, steps, fwd, _f2_one(kc, cw))

    carry0 = _unfold_inv_tree(run_w, tinv_r[0, 0, 0], kc, _f2_mul)

    def bwd(i, carry):
        j = steps - 1 - i
        sl = pl.ds(j * cw, cw)
        x1, x2, y1, y2, b1, b2 = _sel20_pair(
            kc, offs, tx1, tx2, ty1, ty2, d1, d2, j, cw
        )
        den = _f2_sub(x2, x1, kc, offs[:, 0:1])
        den = jnp.where(b1 | b2, _f2_one(kc, x1.shape[1]), den)
        dinv = _f2_mul(carry, pre_r[:, sl], kc)
        carry = _f2_mul(carry, den, kc)

        num = _f2_sub(y2, y1, kc, offs[:, 1:2])
        lam = _f2_mul(num, dinv, kc)
        t = _f2_mul(lam, lam, kc)
        sx = _f2_add(x1, x2, kc)
        x3 = _f2_sub(t, sx, kc, offs[:, 2:3])
        if reset:
            x3 = _f2_mul(x3, _f2_one(kc, x3.shape[1]), kc)
        w = _f2_sub(x1, x3, kc, offs[:, 3:4])
        u = _f2_mul(lam, w, kc)
        y3 = _f2_sub(u, y1, kc, offs[:, 4:5])

        x3 = jnp.where(b1, x2, jnp.where(b2, x1, x3))
        y3 = jnp.where(b1, y2, jnp.where(b2, y1, y3))
        x3r[0, 0, :, sl] = x3.astype(jnp.uint16)
        y3r[0, 0, :, sl] = y3.astype(jnp.uint16)
        i3r[0, 0, :, sl] = jnp.broadcast_to(
            (b1 & b2).astype(jnp.uint16), (IROWS, x3.shape[1])
        )
        return carry

    jax.lax.fori_loop(0, steps, bwd, carry0)


def tree_level0_fused_g2(tabx, taby, d, bx: int, by: int, reset: bool,
                         interpret: bool = False):
    """G2 level 0 fused with digit selection.

    tabx, taby: (8, 35, 2, M, S) u16; d: (W, M, S) int8.  Returns the
    halved flat-Fq2 (x3, y3, inf3) -- bit-identical to
    tree_level_g2(_select_chunk_g2(...))."""
    Wn, M, S = d.shape
    half = S // 2
    L = min(LMAX2, half)
    T = half // L
    assert T * L == half, (S, L)
    cw = min(CW, L)
    offs = jnp.asarray(_level_offs(bx, by, reset, OMUL2, ynk=24))
    consts = _consts()
    off_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    # Mosaic block constraint (see tree_level0_fused): query axis to
    # the front, components flattened into 70 flat-Fq2 rows (c0 rows
    # then c1 -- a (2, L) sublane tile would pad 2 -> 8 in VMEM),
    # digits flattened
    def _flat70(tab):
        t = jnp.moveaxis(tab, 3, 0)        # (M, 8, 35, 2, S)
        t = jnp.swapaxes(t, 2, 3)          # (M, 8, 2, 35, S)
        return t.reshape(M, HALF, NROW2, S)

    tabx = _flat70(tabx)
    taby = _flat70(taby)
    d = d.reshape(Wn * M, 1, S)

    def tabtile(col_block):
        return pl.BlockSpec(
            (1, HALF, NROW2, L), lambda m, t, w, cb=col_block:
            (m, 0, 0, t + cb), memory_space=pltpu.VMEM,
        )

    def dtile(col_block):
        return pl.BlockSpec(
            (1, 1, L), lambda m, t, w, cb=col_block:
            (w * M + m, 0, t + cb), memory_space=pltpu.VMEM,
        )

    tot = pl.pallas_call(
        functools.partial(_a20_kernel, L, cw),
        grid=(M, T, Wn),
        in_specs=_cspecs() + [off_spec] + [
            tabtile(0), tabtile(T), dtile(0), dtile(T)],
        out_specs=pl.BlockSpec(
            (1, 1, NROW2, LANE), lambda m, t, w: (m, w, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((M, Wn, NROW2, T * LANE),
                                       jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, offs, tabx, tabx, d, d)

    flat = tot.transpose(2, 0, 1, 3).reshape(NROW2, M * Wn * T * LANE)
    dig = jnp.asarray(_fermat_digits()[None])
    steps = M * Wn * T
    inv = pl.pallas_call(
        functools.partial(_n2_kernel, steps),
        in_specs=_cspecs() + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.uint32),
        scratch_shapes=[pltpu.VMEM((16, NCH, LANE), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, dig, flat)
    invb = inv.reshape(NROW2, M, Wn, T, LANE).transpose(1, 2, 3, 0, 4)

    u16 = jnp.uint16
    x3, y3, i3 = pl.pallas_call(
        functools.partial(_b20_kernel, L, cw, reset),
        grid=(M, T, Wn),
        in_specs=_cspecs() + [off_spec] + [
            tabtile(0), tabtile(T), tabtile(0), tabtile(T),
            dtile(0), dtile(T),
            pl.BlockSpec(
                (1, 1, 1, NROW2, LANE),
                lambda m, t, w: (m, w, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, NROW2, L), lambda m, t, w: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, NROW2, L), lambda m, t, w: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, IROWS, L), lambda m, t, w: (m, w, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, Wn, NROW2, half), u16),
            jax.ShapeDtypeStruct((M, Wn, NROW2, half), u16),
            jax.ShapeDtypeStruct((M, Wn, IROWS, half), u16),
        ],
        scratch_shapes=[pltpu.VMEM((NROW2, L), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, offs, tabx, tabx, taby, taby, d, d, invb)
    return x3, y3, i3


def _select_chunk_g2(tabx, taby, d):
    """tabx/taby: (8, 35, 2, M, S) u16; d: (W, M, S) int8 ->
    x, y: (M, W, 70, S) u16; inf: (M, W, IROWS, S) u16."""
    ctx = RNS.RQ
    ad = jnp.abs(d.astype(jnp.int32))
    admw = jnp.moveaxis(ad, 0, 1)[:, :, None, :]   # (M, W, 1, S)

    def pick(tab):
        # (8, 35, 2, M, S) -> (8, M, 70, S): c0 rows then c1 rows
        # (a reshape would interleave components per channel)
        t = tab.astype(jnp.uint32)
        t = jnp.concatenate([t[:, :, 0], t[:, :, 1]], axis=1)
        t = jnp.moveaxis(t, 2, 1)
        exp = t[:, :, None]                  # (8, M, 1, 70, S)
        sel = exp[0]
        for k in range(2, HALF + 1):
            sel = jnp.where(admw == k, exp[k - 1], sel)
        return sel                           # (M, W, 70, S)

    sx = pick(tabx)
    sy = pick(taby)
    neg = jnp.moveaxis(d, 0, 1)[:, :, None, :] < 0
    off24 = np.concatenate([MT._off_vec(24, ctx.modulus)] * 2)
    pp = np.concatenate([ctx.p] * 2)
    yn = jnp.asarray(off24)[None, None, :, None] + \
        jnp.asarray(pp)[None, None, :, None] - sy
    yn = jnp.where(yn >= jnp.asarray(pp)[None, None, :, None],
                   yn - jnp.asarray(pp)[None, None, :, None], yn)
    sy = jnp.where(neg, yn, sy)
    inf = jnp.broadcast_to(
        admw == 0, sx.shape[:2] + (IROWS, sx.shape[3])
    )
    return (sx.astype(jnp.uint16), sy.astype(jnp.uint16),
            inf.astype(jnp.uint16))


def tree_window_sums_fused_g2(tables: MT.AffineTables, scalars, ops,
                              interpret: bool = False,
                              min_kernel: int = 128):
    """Pre-Horner per-window sums of the fused G2 tree MSM (leaves
    (35, 2, W, M) projective)."""
    assert tables.is_g2
    C, S, M = tables.chunks, tables.chunk_cols, tables.m
    n_pad = C * S
    # only log2(S) levels ever run; deeper G2 plans would trip the
    # by-bound assert (by grows 12N per level)
    plan = MT._level_plan(max(S.bit_length() - 1, 1), True)

    if scalars.shape[-1] < n_pad:
        scalars = jnp.pad(
            scalars, ((0, 0),) * (scalars.ndim - 1)
            + ((0, n_pad - scalars.shape[-1]),)
        )
    d = MSM.signed_digits(scalars, 4).astype(jnp.int8)
    d = jnp.moveaxis(d.reshape(WIN, M, C, S), 2, 0)
    d = MT.mask_ident_digits(d, tables.ident)

    tail = max(min_kernel, 128)

    def chunk_partials(tabx, taby, dg):
        lvl = 0
        n_k = S
        if n_k > tail:
            bx, by, reset = plan[0]
            x, y, inf = tree_level0_fused_g2(tabx, taby, dg, bx, by,
                                             reset,
                                             interpret=interpret)
            n_k //= 2
            lvl = 1
        else:
            x, y, inf = _select_chunk_g2(tabx, taby, dg)
        while n_k > tail:
            bx, by, reset = plan[lvl]
            x, y, inf = tree_level_g2(x, y, inf, bx, by, reset,
                                      interpret=interpret)
            n_k //= 2
            lvl += 1
        fld = MT.Fq2Adapter()
        xc = jnp.stack(
            [jnp.moveaxis(x[:, :, :NCH], 2, 0),
             jnp.moveaxis(x[:, :, NCH:], 2, 0)], axis=1
        ).astype(jnp.uint32)                 # (35, 2, M, W, n_k)
        yc = jnp.stack(
            [jnp.moveaxis(y[:, :, :NCH], 2, 0),
             jnp.moveaxis(y[:, :, NCH:], 2, 0)], axis=1
        ).astype(jnp.uint32)
        ic = inf[:, :, 0, :] != 0
        return MT._proj_of_affine(xc, yc, ic, fld, ops)

    def scan_body(carry, xs):
        tabx, taby, dg = xs
        part = chunk_partials(tabx, taby, dg)
        return ec.point_add(carry, part, ops), None

    first = chunk_partials(tables.tx[0], tables.ty[0], d[0])
    if C > 1:
        acc, _ = jax.lax.scan(
            scan_body, first, (tables.tx[1:], tables.ty[1:], d[1:])
        )
    else:
        acc = first

    T = min(S, tail)
    if T > 1:
        acc = MSM.lane_fold(acc, ops, T)
    else:
        acc = jax.tree_util.tree_map(lambda a: a[..., 0], acc)
    return jax.tree_util.tree_map(
        lambda a: jnp.swapaxes(a, -1, -2), acc
    )


def msm_tree_fused_g2(tables: MT.AffineTables, scalars, ops,
                      interpret: bool = False, min_kernel: int = 128):
    """M same-size G2 MSMs with Pallas-fused flat-Fq2 tree levels.
    Same contract as msm_affine_tree (leaves (35, 2, M))."""
    wsum = tree_window_sums_fused_g2(tables, scalars, ops, interpret,
                                     min_kernel)
    return MSM.horner_windows(wsum, ops, True, 4)
