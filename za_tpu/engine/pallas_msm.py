"""Fused Pallas TPU kernel for the dense window-parallel MSM.

The XLA dense MSM (msm.msm_limbs_dense) is HBM-bound: every field-op
intermediate of the ~14-mul point addition streams to HBM at
(W, M, L)-batch width.  This kernel keeps the per-(window-tile, chunk)
accumulator and all temporaries in VMEM; HBM traffic drops to the
point tables + digits streamed once per chunk, and the VPU runs at
arithmetic speed instead of memory speed.

Grid layout: (W_tiles, C) with the chunk axis innermost, so the
window-sum accumulator lives in VMEM scratch across all C chunk steps
of a window tile (TPU grids execute sequentially; scratch persists).
The radix-4 select (identity / P / 2P / 3P by 2-bit digit) and one
complete point addition per step run fused.  Outputs are per-lane
window sums (16, W, M, L); the lane fold and Horner window combine are
tiny and stay in XLA (msm.msm_limbs_dense consumes them identically).

Replaces the multicore bucket MSM inside bellman_ce
(SURVEY.md section 2.3) as the Groth16 proof MSM engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ec, field as F

SCALAR_BITS = 254


def _mul_wide_rows(a, b):
    """mul_wide with the partial-product rows accumulated sequentially:
    identical arithmetic to field.mul_wide but never materializes the
    (16, 16, ...) outer product -- inside a Pallas kernel every live
    array occupies VMEM, so peak footprint matters more than HLO op
    count."""
    tail = [(0, 0)] * (a.ndim - 1)
    cols = None
    for i in range(F.NLIMBS):
        p = a[i] * b  # (16, ...) exact u32 products
        row = jnp.pad(p & F.MASK, [(i, F.NLIMBS - i)] + tail) + jnp.pad(
            p >> F.LIMB_BITS, [(i + 1, F.NLIMBS - 1 - i)] + tail
        )
        cols = row if cols is None else cols + row
    return cols


def _patched_mul_wide():
    """Context manager: route field.mul_wide through the sequential-row
    variant while tracing a Pallas kernel body."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        orig = F.mul_wide
        F.mul_wide = _mul_wide_rows
        try:
            yield
        finally:
            F.mul_wide = orig

    return cm()


def _identity_coords(ops, is_g2: bool, shape):
    """(0 : 1 : 0) in Montgomery form, each coord broadcast to shape,
    as the flat coordinate list matching _flatten order (built via
    F.const_limbs, so it is Pallas-kernel-safe in kernel-const mode)."""
    one_l = ops.one[0] if is_g2 else ops.one
    one = F.const_limbs(one_l, shape)
    zero = jnp.zeros(shape, dtype=jnp.uint32)
    if is_g2:
        return [zero, zero, one, zero, zero, zero]
    return [zero, one, zero]


def _flatten(point):
    """G1 (X, Y, Z) -> [X, Y, Z]; G2 ((x0,x1), ...) -> [x0, x1, ...]."""
    out = []
    for coord in point:
        if isinstance(coord, tuple):
            out.extend(coord)
        else:
            out.append(coord)
    return out


def _unflatten(leaves, is_g2: bool):
    if is_g2:
        return (
            (leaves[0], leaves[1]),
            (leaves[2], leaves[3]),
            (leaves[4], leaves[5]),
        )
    return (leaves[0], leaves[1], leaves[2])


def dense_msm_window_sums(points, scalars, ops, is_g2: bool,
                          w_tile: int = 8, lanes: int = 128,
                          interpret: bool = False):
    """Window sums for M same-size MSMs, radix-4, fused in Pallas.

    points:  point pytree, leaves (16, M, n) projective Montgomery
    scalars: (16, M, n) uint32 plain-form 16-bit digits
    returns point pytree with leaves (16, W, M, L): per-lane sums of
    window w (bits [2w, 2w+2)) for msm m -- lane fold + Horner pending.
    """
    first = points[0][0] if is_g2 else points[0]
    M, n = first.shape[1], first.shape[2]
    L = lanes
    C = -(-n // L)
    n_pad = C * L
    if n_pad != n:
        def padp(x):
            return jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (n_pad - n,), dtype=x.dtype)],
                axis=-1,
            )

        points = jax.tree_util.tree_map(padp, points)
        scalars = padp(scalars)

    # small multiples (2 batched adds in XLA -- cheap relative to the loop)
    t2 = ec.point_add(points, points, ops)
    t3 = ec.point_add(t2, points, ops)

    def rsh(x):  # (16, M, n_pad) -> (C, 16, M, L): chunk axis leading so
        # the per-chunk block (1, 16, M, L) keeps its last two dims equal
        # to the full array dims (Pallas TPU block-shape constraint)
        return jnp.moveaxis(x.reshape(x.shape[:-1] + (C, L)), 2, 0)

    tab_leaves = []
    for t in (points, t2, t3):
        tab_leaves.extend(_flatten(jax.tree_util.tree_map(rsh, t)))
    ncoord = len(tab_leaves) // 3  # 3 for G1, 6 for G2

    # 2-bit digits of all windows: (C, W_pad, M, L) int32
    W = (SCALAR_BITS + 1) // 2  # 127
    WT = w_tile
    n_wt = -(-W // WT)
    W_pad = n_wt * WT
    shifts = jnp.arange(0, F.LIMB_BITS, 2, dtype=jnp.uint32)
    d_all = (scalars[:, None] >> shifts[None, :, None, None]) & 3
    digits = d_all.reshape(F.NLIMBS * (F.LIMB_BITS // 2), M, C * L)[:W]
    if W_pad != W:  # pad windows with digit 0 -> identity sums
        digits = jnp.concatenate(
            [digits, jnp.zeros((W_pad - W, M, C * L), jnp.uint32)]
        )
    digits = (
        digits.reshape(W_pad, M, C, L)
        .transpose(2, 0, 1, 3)
        .astype(jnp.int32)
    )  # (C, W_pad, M, L)

    acc_shape = (F.NLIMBS, WT, M, L)

    def kernel(*refs):
        tab_refs = refs[0:3 * ncoord]
        d_ref = refs[3 * ncoord]
        out_refs = refs[1 + 3 * ncoord: 1 + 3 * ncoord + ncoord]
        acc_refs = refs[1 + 3 * ncoord + ncoord:]
        c = pl.program_id(1)
        # kernel-const mode: limb constants become iota/where chains of
        # scalar immediates (pallas_call rejects captured arrays and
        # Mosaic cannot shape-cast traced 1D rows)
        with F.kernel_const_mode(), _patched_mul_wide():
            kops = ec.G2_OPS if is_g2 else ec.G1_OPS
            ident = _identity_coords(kops, is_g2, acc_shape)

            @pl.when(c == 0)
            def _():
                for r, iv in zip(acc_refs, ident):
                    r[:] = iv

            d = d_ref[:][0]  # (WT, M, L)

            def sel_coord(k):
                # tab blocks are (1, 16, M, L) -> broadcast over WT
                t1 = tab_refs[k][:][0][:, None]            # (16,1,M,L)
                t2_ = tab_refs[ncoord + k][:][0][:, None]
                t3_ = tab_refs[2 * ncoord + k][:][0][:, None]
                out = jnp.where(d == 1, t1, ident[k])
                out = jnp.where(d == 2, t2_, out)
                return jnp.where(d == 3, t3_, out)

            sel = _unflatten([sel_coord(k) for k in range(ncoord)], is_g2)
            acc = _unflatten([r[:] for r in acc_refs], is_g2)
            new = ec.point_add(acc, sel, kops)
            for r, v in zip(acc_refs, _flatten(new)):
                r[:] = v

            @pl.when(c == pl.num_programs(1) - 1)
            def _():
                for o, r in zip(out_refs, acc_refs):
                    o[:] = r[:]

    tab_spec = pl.BlockSpec(
        (1, F.NLIMBS, M, L), lambda wt, c: (c, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    d_spec = pl.BlockSpec(
        (1, WT, M, L), lambda wt, c: (c, wt, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (F.NLIMBS, WT, M, L), lambda wt, c: (0, wt, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(
        (F.NLIMBS, W_pad, M, L), jnp.uint32
    )

    outs = pl.pallas_call(
        kernel,
        grid=(n_wt, C),
        in_specs=[tab_spec] * (3 * ncoord) + [d_spec],
        out_specs=[out_spec] * ncoord,
        out_shape=[out_shape] * ncoord,
        scratch_shapes=[pltpu.VMEM(acc_shape, jnp.uint32)] * ncoord,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*tab_leaves, digits)

    wsums = [o[:, :W] for o in outs]
    return _unflatten(wsums, is_g2)
