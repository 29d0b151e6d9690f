"""Fused Pallas TPU kernel for the signed-dense RNS MSM.

The XLA RNS MSM (msm.msm_signed_dense over the engine/rns.py field
core) is HBM-bound: each chunk step materializes ~100 (35, W*M*L)
intermediates through HBM.  This kernel keeps the whole per-MSM
accumulator (all 64 signed radix-16 windows) resident in VMEM as the
output block, builds the per-chunk {P..8P} select table in-kernel, and
runs the complete-RCB point addition fused -- HBM traffic drops to one
pass over the staged points (420 B/point) plus the int8 digit stream.

Layout (everything 2D inside the kernel; Mosaic dislikes reshapes of
traced data, so the flattening happens in XLA outside):

  * grid (M, C): MSM index outer, point-chunk inner.  The output block
    (1, 35, W*L) per coordinate plane has index (m, 0, 0) -- constant
    across chunks, so it stays in VMEM and doubles as the accumulator.
  * batch columns are w-major: column b = w*L + l holds window w of
    chunk point l.  Table planes (35, L) expand to (35, W*L) by
    doubling lane-concats; digits arrive pre-transposed as int8.
  * field values are (35, B) u32 channel-residue arrays; G2 flat-Fq2
    coordinates are (c0, c1) PAIRS of planes (the arrays stay 2D; the
    nested-tuple XLA miscompile class does not apply to Mosaic).
  * RNS constants enter as pre-shaped inputs ((35, k) u32 columns and
    (18, 34) int8 extension matrices); axis-0 concatenation is done as
    pad+add, which lowers to plain sublane shifts.

Bound discipline is byte-identical to engine/rns.py: mont inputs
< 512N, sub offsets 32N / 8N (Fq2 cross term), Kawamura shaved-f32
alpha for ext1, Shenoy-Kumaresan exact ext2.  Differential tests pin
the kernel (interpret mode and TPU) against the host golden model.

Replaces bellman_ce's multicore multiexp (SURVEY.md section 2.3,
/root/reference/prover/Cargo.toml:19) as the Groth16 proof MSM engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ec, msm as MSM, rns as RNS

MASK16 = RNS.MASK16
KB = RNS.K_BASE      # 17 channels per base
NCH = RNS.N_CH       # 35 channels total
NT = KB + 1          # 18 extension-target channels
WIN = 64             # ceil(254/4) signed radix-16 windows
N_CONST = 8          # leading constant inputs to the kernel


def _fold3(v, eps, p):
    """u32 -> canonical residue (3 pseudo-Mersenne folds + cond-sub)."""
    v = (v >> 16) * eps + (v & MASK16)
    v = (v >> 16) * eps + (v & MASK16)
    v = (v >> 16) * eps + (v & MASK16)
    return jnp.where(v >= p, v - p, v)


def _vcat(a, b):
    """Axis-0 concat as pad+add (sublane shifts; avoids Mosaic concat
    on the second-minor axis)."""
    ra, rb = a.shape[0], b.shape[0]
    return jnp.pad(a, ((0, rb), (0, 0))) + jnp.pad(b, ((ra, 0), (0, 0)))


# -- constants bundle ---------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _consts_np(g2: bool):
    """The RNS context packed into 8 kernel inputs: int8 extension
    matrices, the shaved-f32 reciprocals, and u32 per-channel columns
    (35-row, 17-row, and 18-row groups)."""
    ctx = RNS.RQ
    from ..curve import B2, Q

    if g2:
        b3_cols = [
            ctx.ints_to_rns([ctx.to_mont_int((3 * B2.c0) % Q)])[:, 0],
            ctx.ints_to_rns([ctx.to_mont_int((3 * B2.c1) % Q)])[:, 0],
        ]
    else:
        b3_cols = [ctx.ints_to_rns([ctx.to_mont_int(9)])[:, 0]]

    cu35 = np.stack(
        [ctx.p, ctx.eps, ctx.sub_off, ctx.sub_off8, ctx.one_rns,
         ctx.sub_off64] + b3_cols,
        axis=1,
    ).astype(np.uint32)

    koff = np.array(
        [p * ((1 << 21) // p + 1) for p in ctx.b1], dtype=np.uint32
    )
    cu17 = np.stack([ctx.lamw1, ctx.w2, koff], axis=1)

    tgt1 = ctx.b2 + [ctx.pr]
    tgt2 = ctx.b1 + [ctx.pr]
    p_t1 = np.array(tgt1, dtype=np.uint32)
    p_t2 = np.array(tgt2, dtype=np.uint32)
    cu18 = np.stack(
        [
            p_t1, (np.uint32(1 << 16) - p_t1).astype(np.uint32),
            ctx.m1_mod_t1, ctx.m1inv_t, ctx.nm1inv_t,
            ctx.ext1_k, ctx.red_off["ext1"],
            p_t2, (np.uint32(1 << 16) - p_t2).astype(np.uint32),
            ctx.ext2_k, ctx.red_off["ext2"], ctx.m2_mod_t2,
        ],
        axis=1,
    ).astype(np.uint32)

    rcp = ctx.alpha_rcp.reshape(KB, 1).astype(np.float32)
    return (
        ctx.ext1_w0, ctx.ext1_w1, ctx.ext2_w0, ctx.ext2_w1,
        rcp, cu35, cu17, cu18,
    )


class _KC:
    """Traced constant columns, loaded once per kernel invocation."""

    def __init__(self, refs, g2: bool):
        e1w0, e1w1, e2w0, e2w1, rcp, cu35, cu17, cu18 = refs
        self.e1w0 = e1w0[:]
        self.e1w1 = e1w1[:]
        self.e2w0 = e2w0[:]
        self.e2w1 = e2w1[:]
        self.rcp = rcp[:]
        c35 = cu35[:]
        c17 = cu17[:]
        c18 = cu18[:]
        self.p = c35[:, 0:1]
        self.eps = c35[:, 1:2]
        self.sub32 = c35[:, 2:3]
        self.sub8 = c35[:, 3:4]
        self.one = c35[:, 4:5]
        self.sub64 = c35[:, 5:6]
        self.b3 = (c35[:, 6:7], c35[:, 7:8]) if g2 else c35[:, 6:7]
        self.lamw1 = c17[:, 0:1]
        self.w2 = c17[:, 1:2]
        self.koff = c17[:, 2:3]
        self.p_t1 = c18[:, 0:1]
        self.eps_t1 = c18[:, 1:2]
        self.m1_mod = c18[:, 2:3]
        self.m1inv = c18[:, 3:4]
        self.nm1inv = c18[:, 4:5]
        self.e1k = c18[:, 5:6]
        self.red1 = c18[:, 6:7]
        self.p_t2 = c18[:, 7:8]
        self.eps_t2 = c18[:, 8:9]
        self.e2k = c18[:, 9:10]
        self.red2 = c18[:, 10:11]
        self.m2_mod = c18[:, 11:12]
        ctx = RNS.RQ
        self.pr = int(ctx.pr)
        self.eps_r = (1 << 16) - int(ctx.pr)
        self.m2inv_r = int(ctx.m2inv_r)


# -- kernel-side RNS field arithmetic (mirrors engine/rns.py) -----------------


def _kext(lam, w0, w1, kvec, red, p_t, eps_t, alpha=None, m_mod=None):
    """CRT base extension via two int8 MXU matmuls (rns._extend)."""
    d_lo = (lam & 255).astype(jnp.int32) - 128
    d_hi = (lam >> 8).astype(jnp.int32) - 128
    d = _vcat(d_lo, d_hi).astype(jnp.int8)  # (2*ns, B)
    dn = (((1,), (0,)), ((), ()))
    p0 = jax.lax.dot_general(w0, d, dn, preferred_element_type=jnp.int32)
    p1 = jax.lax.dot_general(w1, d, dn, preferred_element_type=jnp.int32)
    pre = p0 + (p1 << 8) + kvec.astype(jnp.int32)
    if alpha is not None:
        pre = pre - alpha * m_mod.astype(jnp.int32)
    v = (pre + red.astype(jnp.int32)).astype(jnp.uint32)
    return _fold3(v, eps_t, p_t)


def _kmul(a, b, kc: _KC):
    """RNS Montgomery product on (35, B) planes (rns.mont_mul_rns)."""
    t = _fold3(a * b, kc.eps, kc.p)
    t1, t2 = t[:KB], t[KB:]
    lam = _fold3(t1 * kc.lamw1, kc.eps[:KB], kc.p[:KB])
    # Mosaic has no u32->f32 cast; lam < 2^16 so going through i32 is
    # exact (Kawamura underestimate, delta in {0, 1})
    lam_f = lam.astype(jnp.int32).astype(jnp.float32)
    alpha = jnp.floor(
        jnp.sum(lam_f * kc.rcp, axis=0, keepdims=True)
    ).astype(jnp.int32)
    q = _kext(lam, kc.e1w0, kc.e1w1, kc.e1k, kc.red1, kc.p_t1, kc.eps_t1,
              alpha=alpha, m_mod=kc.m1_mod)
    r_t = _fold3(t2 * kc.m1inv, kc.eps_t1, kc.p_t1)
    r_q = _fold3(q * kc.nm1inv, kc.eps_t1, kc.p_t1)
    s = r_t + r_q
    r2 = jnp.where(s >= kc.p_t1, s - kc.p_t1, s)  # (18, B) at B2+r
    lam2 = _fold3(r2[:KB] * kc.w2, kc.eps_t1[:KB], kc.p_t1[:KB])
    s_all = _kext(lam2, kc.e2w0, kc.e2w1, kc.e2k, kc.red2,
                  kc.p_t2, kc.eps_t2)  # (18, B) at B1+r
    pr = jnp.uint32(kc.pr)
    d_r = s_all[KB:] + pr - r2[KB:]
    d_r = jnp.where(d_r >= pr, d_r - pr, d_r)
    alpha2 = _fold3(d_r * jnp.uint32(kc.m2inv_r), jnp.uint32(kc.eps_r), pr)
    am = alpha2 * kc.m2_mod[:KB]  # < 17 * 2^16 < 2^21
    v = s_all[:KB] + kc.koff - am
    r1 = _fold3(v, kc.eps[:KB], kc.p[:KB])
    return _vcat(r1, r2)


def _kadd(a, b, kc: _KC):
    s = a + b
    return jnp.where(s >= kc.p, s - kc.p, s)


def _ksub(a, b, kc: _KC, off):
    s = a + off + kc.p - b
    s = jnp.where(s >= kc.p, s - kc.p, s)
    return jnp.where(s >= kc.p, s - kc.p, s)


def _g1_kops(kc: _KC) -> ec.FieldOps:
    def mul(a, b):
        return _kmul(a, b, kc)

    return ec.FieldOps(
        add=lambda a, b: _kadd(a, b, kc),
        sub=lambda a, b: _ksub(a, b, kc, kc.sub32),
        mul=mul,
        b3_mul=lambda a: _kmul(a, jnp.broadcast_to(kc.b3, a.shape), kc),
        zero=None, one=None,
        mul_many=lambda pairs: [mul(a, b) for a, b in pairs],
        b3_const=lambda like: jnp.broadcast_to(kc.b3, like.shape),
        add_many=lambda pairs: [_kadd(a, b, kc) for a, b in pairs],
        sub_many=lambda pairs: [_ksub(a, b, kc, kc.sub32)
                                for a, b in pairs],
    )


def _g2_kops(kc: _KC) -> ec.FieldOps:
    """Fq2 over (c0, c1) plane pairs: KARATSUBA (3 mont muls vs the
    schoolbook 4 -- the mont mul dominates the kernel's VPU work).

    Bound audit (represented-integer bounds per (c0, c1) component,
    mont contract < 512N per operand):
      mul out: c0 = t0-t1 (8N off) < 12N; c1 = cross-t0-t1 (two 8N
      offs) < 20N.  With the 64N subtraction offset the RCB dataflow
      is stationary at coords X<(44,52)N, Y/Z<(24,40)N; negated Y
      <(64,64)N; pre-mul coordinate sums < (108,116)N and Karatsuba
      operand sums < 224N -- all inside the 512N contract.  The 64N
      offset window covers every subtrahend (max a01-type = (24,40)N).
    """

    def add(a, b):
        return (_kadd(a[0], b[0], kc), _kadd(a[1], b[1], kc))

    def sub(a, b):
        return (_ksub(a[0], b[0], kc, kc.sub64),
                _ksub(a[1], b[1], kc, kc.sub64))

    def mul(a, b):
        t0 = _kmul(a[0], b[0], kc)
        t1 = _kmul(a[1], b[1], kc)
        cross = _kmul(_kadd(a[0], a[1], kc), _kadd(b[0], b[1], kc), kc)
        c0 = _ksub(t0, t1, kc, kc.sub8)
        c1 = _ksub(_ksub(cross, t0, kc, kc.sub8), t1, kc, kc.sub8)
        return (c0, c1)

    def b3c(like):
        return (jnp.broadcast_to(kc.b3[0], like[0].shape),
                jnp.broadcast_to(kc.b3[1], like[1].shape))

    return ec.FieldOps(
        add=add, sub=sub, mul=mul,
        b3_mul=lambda a: mul(a, b3c(a)),
        zero=None, one=None,
        mul_many=lambda pairs: [mul(a, b) for a, b in pairs],
        b3_const=b3c,
        add_many=lambda pairs: [add(a, b) for a, b in pairs],
        sub_many=lambda pairs: [sub(a, b) for a, b in pairs],
    )


# -- kernel body --------------------------------------------------------------


def _point_of(planes, g2: bool):
    if g2:
        return ((planes[0], planes[1]), (planes[2], planes[3]),
                (planes[4], planes[5]))
    return (planes[0], planes[1], planes[2])


def _planes_of(point, g2: bool):
    if g2:
        (x0, x1), (y0, y1), (z0, z1) = point
        return [x0, x1, y0, y1, z0, z1]
    return list(point)


def _twhere(cond, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(cond, x, y), a, b)


def _kernel(g2: bool, L: int, B: int, ncoord: int, *refs):
    kc = _KC(refs[:N_CONST], g2)
    pt_refs = refs[N_CONST:N_CONST + ncoord]
    d_ref = refs[N_CONST + ncoord]
    out_refs = refs[N_CONST + ncoord + 1:ncoord + N_CONST + 1 + ncoord]
    tab_refs = refs[N_CONST + 2 * ncoord + 1:]
    c = pl.program_id(1)
    kops = _g2_kops(kc) if g2 else _g1_kops(kc)

    # chunk points -> {1P .. 8P} multiples at (35, L), built with ONE
    # point-add instantiation (fori_loop over the table scratch --
    # keeps the Mosaic program ~4x smaller than unrolling, which cuts
    # both compile time and the per-process executable-load cost)
    planes = [r[:][0, 0] for r in pt_refs]
    P = _point_of(planes, g2)
    for r, v in zip(tab_refs, planes):
        r[0] = v

    def build_body(k, _):
        cur = _point_of([r[k] for r in tab_refs], g2)
        new = ec.point_add(cur, P, kops)
        for r, v in zip(tab_refs, _planes_of(new, g2)):
            r[k + 1] = v
        return 0

    jax.lax.fori_loop(0, 7, build_body, 0)

    d = d_ref[:][0, 0].astype(jnp.int32)  # (1, B) signed digits
    ad = jnp.abs(d)

    def expand(x):  # (35, L) -> (35, B) w-major tile by lane doubling
        while x.shape[1] < B:
            x = jnp.concatenate([x, x], axis=1)
        return x

    def sel_body(k, sel_planes):
        cond = ad == k + 1
        return [
            jnp.where(cond, expand(r[k]), s)
            for r, s in zip(tab_refs, sel_planes)
        ]

    sel_planes = jax.lax.fori_loop(
        1, 8, sel_body, [expand(r[0]) for r in tab_refs]
    )
    X, Y, Z = _point_of(sel_planes, g2)
    negY = kops.sub(jax.tree_util.tree_map(jnp.zeros_like, Y), Y)
    sel = (X, _twhere(d < 0, negY, Y), Z)

    @pl.when(c == 0)
    def _():  # accumulator init: (0 : 1 : 0) in Montgomery RNS
        one = jnp.broadcast_to(kc.one, (NCH, B))
        zero = jnp.zeros((NCH, B), jnp.uint32)
        ident = [zero, zero, one, zero, zero, zero] if g2 \
            else [zero, one, zero]
        for r, v in zip(out_refs, ident):
            r[0] = v

    acc = _point_of([r[:][0] for r in out_refs], g2)
    new = ec.point_add(acc, sel, kops)
    res = _twhere(d == 0, acc, new)
    for r, v in zip(out_refs, _planes_of(res, g2)):
        r[0] = v


# -- host-facing entry --------------------------------------------------------


def dense_window_sums_pallas(points, scalars, ops, lanes: int = 128,
                             interpret: bool = False):
    """Pre-Horner per-window sums of the fused dense MSM: the Pallas
    accumulation + lane fold, WITHOUT the Horner combine.  Leaves
    (35[, 2], W, M) projective -- the sharded path all_gathers and
    point-reduces these across chips before Horner."""
    first = jax.tree_util.tree_leaves(points)[0]
    is_g2 = first.ndim == 4
    M, n = first.shape[-2], first.shape[-1]
    L = lanes
    B = WIN * L
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

    # digits: (W, M, n_pad) int32 in [-8, 8] -> int8 (M, C, 1, W*L),
    # columns w-major (b = w*L + l)
    dg = MSM.signed_digits(scalars, 4).astype(jnp.int8)
    dg = (
        dg.reshape(WIN, M, C, L)
        .transpose(1, 2, 0, 3)
        .reshape(M, C, 1, B)
    )

    # coordinate planes -> (M, C, 35, L)
    def prep(x):
        return x.reshape(NCH, M, C, L).transpose(1, 2, 0, 3)

    if is_g2:
        plane_arrays = []
        for coord in points:
            plane_arrays.append(prep(coord[:, 0]))
            plane_arrays.append(prep(coord[:, 1]))
    else:
        plane_arrays = [prep(coord) for coord in points]
    ncoord = len(plane_arrays)

    consts = [jnp.asarray(a) for a in _consts_np(is_g2)]
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * N_CONST
    pt_spec = pl.BlockSpec(
        (1, 1, NCH, L), lambda m, c: (m, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    d_spec = pl.BlockSpec(
        (1, 1, 1, B), lambda m, c: (m, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, NCH, B), lambda m, c: (m, 0, 0), memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((M, NCH, B), jnp.uint32)

    outs = pl.pallas_call(
        functools.partial(_kernel, is_g2, L, B, ncoord),
        grid=(M, C),
        in_specs=const_specs + [pt_spec] * ncoord + [d_spec],
        out_specs=[out_spec] * ncoord,
        out_shape=[out_shape] * ncoord,
        scratch_shapes=[pltpu.VMEM((8, NCH, L), jnp.uint32)] * ncoord,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*consts, *plane_arrays, dg)

    def unfold(o):  # (M, 35, W*L) -> (35, W, M, L)
        return o.reshape(M, NCH, WIN, L).transpose(1, 2, 0, 3)

    if is_g2:
        acc = tuple(
            jnp.stack([unfold(outs[2 * i]), unfold(outs[2 * i + 1])],
                      axis=1)
            for i in range(3)
        )  # leaves (35, 2, W, M, L)
    else:
        acc = tuple(unfold(o) for o in outs)

    return MSM.lane_fold(acc, ops, L)  # leaves (35[, 2], W, M)


def msm_signed_dense_pallas(points, scalars, ops, lanes: int = 128,
                            interpret: bool = False):
    """M same-size MSMs, signed radix-16, fused accumulation in Pallas.

    points:  RNS point pytree, leaves (35, M, n) (G1) or flat-Fq2
             (35, 2, M, n) (G2), projective Montgomery
    scalars: (16, M, n) uint32 plain-form 16-bit digits
    ops:     the XLA RNS FieldOps (for the lane-fold/Horner tail)
    returns point pytree with leaves (35, M) / (35, 2, M) -- identical
    contract to msm.msm_signed_dense.
    """
    first = jax.tree_util.tree_leaves(points)[0]
    is_g2 = first.ndim == 4
    wsum = dense_window_sums_pallas(points, scalars, ops, lanes,
                                    interpret)
    return MSM.horner_windows(wsum, ops, is_g2, 4)
