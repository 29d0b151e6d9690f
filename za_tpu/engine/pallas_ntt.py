"""Fused Pallas prefix for the four-step RNS sub-NTTs (experimental).

The XLA sub-NTT (ntt_rns._sub_ntt_axis1) is mont-mul-materialization
bound: every butterfly stage streams ~10 HBM passes of intermediates
(docs/PERF.md "Fused NTT stages").  This kernel fuses the first
log2(M_FUSE) stages of a sub-NTT into ONE pallas_call: the input block
stays VMEM-resident as a list of (35, L)-column PIECES (L = the lane
batch of the four-step layout), every butterfly is a static-slice
piece op, and the twiddle multiply runs the same in-kernel RNS
Montgomery pipeline as the MSM kernels (pallas_msm_rns._kmul) -- just
over the Fr context instead of Fq.

Why pieces: in the flat s-major layout (column = s*L + l) every DIT
stage with segment length m along S has segments of m*L contiguous
columns and butterfly partners (m/2)*L columns apart -- all multiples
of L >= 1024.  Keeping the state as BLK/L pieces of exactly L columns
makes every u/v operand a whole piece: no traced reshapes, no strided
or sub-128 slices, no concats (Mosaic constraints, see
pallas_msm_rns).  Stages with m > M_FUSE fall through to the XLA path
(ntt_rns._sub_ntt_axis1 with start_length), which still applies its
per-stage bounds discipline on the kernel's output (<= 4N + 8N*stages,
same growth law as the pure-XLA pipeline).

Gated by ZA_NTT_FUSED=1 (default off until TPU-validated; the
interpret-mode differential test in tests/test_pallas_ntt.py pins the
kernel against the XLA golden path on CPU).

Role parity: part of the bellman_ce FFT replacement (SURVEY.md
section 2.3; /root/reference/prover/Cargo.toml:19).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rns as RNS
from .pallas_msm_rns import _kadd, _kmul, _ksub

NCH = RNS.N_CH
KB = RNS.K_BASE
N_CONST = 8

#: VMEM column budget per block (u32 cols; 2^17 cols = 18 MB state)
BLK_COLS_MAX = 1 << 17


@functools.lru_cache(maxsize=None)
def _consts_np_fr():
    """The Fr RNS context packed into the 8 kernel inputs expected by
    the _KC layout of pallas_msm_rns (b3 column unused here -> 0)."""
    ctx = RNS.RR
    cu35 = np.stack(
        [ctx.p, ctx.eps, ctx.sub_off, ctx.sub_off8, ctx.one_rns,
         ctx.sub_off64, np.zeros(NCH, dtype=np.uint32)],
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


class _KCF:
    """Duck-typed _KC over the Fr context (pallas_msm_rns._kmul reads
    only these fields; the scalar tail comes from RR, not RQ)."""

    def __init__(self, refs):
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
        ctx = RNS.RR
        self.pr = int(ctx.pr)
        self.eps_r = (1 << 16) - int(ctx.pr)
        self.m2inv_r = int(ctx.m2inv_r)


def _prefix_kernel(L: int, n_pieces: int, m_fuse: int, *refs):
    """Fused DIT stages m = 2..m_fuse on one (35, n_pieces*L) block.

    State = n_pieces VMEM arrays of (35, L); stage with segment length
    m pairs piece (seg*m + k) with (seg*m + m/2 + k).  Butterfly math
    is byte-identical to ntt_rns._sub_ntt_axis1: vt = mont(v, tw);
    u' = u + vt; v' = u + 8N - vt."""
    consts = refs[:N_CONST]
    x_ref, tw_ref, o_ref = refs[N_CONST:]
    kc = _KCF(consts)

    pieces = [x_ref[:, i * L:(i + 1) * L] for i in range(n_pieces)]
    off = 0
    m = 2
    while m <= m_fuse:
        half = m // 2
        for seg in range(n_pieces // m):
            base = seg * m
            for k in range(half):
                u = pieces[base + k]
                v = pieces[base + half + k]
                tw = tw_ref[:, off + k * L: off + (k + 1) * L]
                vt = _kmul(v, tw, kc)
                pieces[base + k] = _kadd(u, vt, kc)
                pieces[base + half + k] = _ksub(u, vt, kc, kc.sub8)
        off += half * L
        m *= 2
    for i in range(n_pieces):
        o_ref[:, i * L:(i + 1) * L] = pieces[i]


def _stage_tables(table, S: int, L: int, m_fuse: int):
    """Concatenated per-stage twiddle tiles for the fused prefix:
    stage m contributes (35, (m/2)*L) = repeat-each-L of
    table[:, ::S//m][:, :m/2] (same slicing as the XLA path)."""
    parts = []
    m = 2
    while m <= m_fuse:
        tw = table[:, ::S // m][:, :m // 2].astype(jnp.uint32)
        parts.append(jnp.repeat(tw, L, axis=1))
        m *= 2
    return jnp.concatenate(parts, axis=1)


def pick_m_fuse(S: int, L: int) -> int:
    """Largest fused-stage segment length that fits the VMEM budget."""
    m = min(S, max(BLK_COLS_MAX // L, 1))
    while m * L > BLK_COLS_MAX and m > 1:
        m //= 2
    return m


def sub_ntt_fused(x, table, S: int, interpret: bool = False):
    """Drop-in for ntt_rns._sub_ntt_axis1: radix-2 DIT NTT along axis 1
    of (35, S, L), first log2(m_fuse) stages in one fused kernel, rest
    on the XLA path."""
    from .ntt_rns import _bitrev_indices, _sub_ntt_axis1

    L = x.shape[2]
    m_fuse = pick_m_fuse(S, L)
    if m_fuse < 4:  # nothing worth fusing at this shape
        return _sub_ntt_axis1(x, table, S)

    x = x[:, np.asarray(_bitrev_indices(S)), :]
    flat = x.reshape(NCH, S * L)
    twt = _stage_tables(table, S, L, m_fuse)

    n_pieces = m_fuse  # block = one whole segment of the last fused stage
    blk = n_pieces * L
    nb = (S * L) // blk
    const_np = _consts_np_fr()
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * N_CONST
    out = pl.pallas_call(
        functools.partial(_prefix_kernel, L, n_pieces, m_fuse),
        grid=(nb,),
        in_specs=const_specs + [
            pl.BlockSpec((NCH, blk), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NCH, blk), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCH, S * L), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*const_np, flat, twt)

    x = out.reshape(NCH, S, L)
    if m_fuse == S:
        return x
    return _sub_ntt_axis1(x, table, S, start_length=2 * m_fuse,
                          skip_bitrev=True)
