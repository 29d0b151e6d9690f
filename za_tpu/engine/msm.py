"""Pippenger multi-scalar multiplication on TPU.

Scatter-conflict-free formulation: the point stream is split across K
lanes; each lane serially accumulates its points into its OWN bucket
array (buckets laid out (B, K) so a step's K updates always hit K
distinct rows -- per-step gather/add/scatter with unique indices).
Lane bucket arrays are then tree-reduced, buckets are weighted by a
suffix associative scan, and windows combine by Horner doubling.

Total point-add count = n*windows + O(2^c log) -- the same as serial
Pippenger, fully vectorized, no data-dependent control flow (digit-0
points land in bucket 0 which carries weight 0).

Replaces bellman's CPU multiexp worker pool (SURVEY.md section 2.3);
the sharded variant splits the point stream per chip and psum-reduces
bucket sums over ICI (za_tpu.engine.mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from .ec import FieldOps, point_add, point_double, point_identity_like

SCALAR_BITS = 254


def pick_window(n: int) -> int:
    """Window size heuristic: bucket work ~ 2^c log2(2^c) vs n per window."""
    if n <= 1:
        return 2
    c = max(2, int(np.log2(max(n, 2))) - 3)
    return min(c, 13)


def digits_from_limbs(scalars, c: int):
    """(16, n) plain u16 limbs -> (windows, n) uint32 digits of c bits."""
    n = scalars.shape[1]
    windows = (SCALAR_BITS + c - 1) // c
    padded = jnp.concatenate(
        [scalars, jnp.zeros((2, n), dtype=jnp.uint32)], axis=0
    )
    outs = []
    for w in range(windows):
        bit = w * c
        j, sh = bit // F.LIMB_BITS, bit % F.LIMB_BITS
        v = padded[j] >> sh
        if sh:
            v = v | (padded[j + 1] << (F.LIMB_BITS - sh))
            v = v | (padded[j + 2] << (2 * F.LIMB_BITS - sh))
        else:
            v = v | (padded[j + 1] << F.LIMB_BITS)
        outs.append(v & ((1 << c) - 1))
    return jnp.stack(outs)


def _tree_reduce(pts, ops: FieldOps, axis_len: int):
    """Reduce point pytree along the trailing batch axis by halving."""
    while axis_len > 1:
        half = axis_len // 2
        odd = axis_len - 2 * half

        def split(a):
            return (
                jax.tree_util.tree_map(lambda x: x[..., :half], a),
                jax.tree_util.tree_map(lambda x: x[..., half : 2 * half], a),
                jax.tree_util.tree_map(lambda x: x[..., 2 * half :], a),
            )

        lo, hi, rest = split(pts)
        red = point_add(lo, hi, ops)
        if odd:
            pts = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=-1), red, rest
            )
            axis_len = half + odd
        else:
            pts = red
            axis_len = half
    return pts


def _weighted_bucket_sum(buckets, ops: FieldOps, B: int):
    """sum_{b=1}^{B-1} b * bucket_b via the classic running/total scan
    (sequential over buckets high-to-low: running += bucket_b;
    total += running). One point-add pair in the compiled graph.

    buckets: point pytree with trailing axis B; returns trailing axis 1."""
    tail = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x[..., 1:], -1, 0)[::-1, ..., None], buckets
    )  # (B-1, ..., 1) high bucket first
    first = jax.tree_util.tree_map(lambda x: x[0], tail)

    def body(carry, bucket):
        running, total = carry
        running = point_add(running, bucket, ops)
        total = point_add(total, running, ops)
        return (running, total), None

    rest = jax.tree_util.tree_map(lambda x: x[1:], tail)
    (_, total), _ = jax.lax.scan(body, (first, first), rest)
    return total


def msm_limbs(px_py_pz, scalars, ops: FieldOps, c: int | None = None,
              lanes: int = 256):
    """MSM over projective Montgomery points and plain u16-limb scalars.

    px_py_pz: point pytree (X, Y, Z), each leaf (16, n)
    scalars:  (16, n) uint32 (16-bit digits, plain form)
    returns a single projective point pytree with trailing batch dim 1.
    """
    first_leaf = jax.tree_util.tree_leaves(px_py_pz)[0]
    n = first_leaf.shape[-1]
    if c is None:
        c = pick_window(n)
    B = 1 << c
    K = min(lanes, n)
    rows = -(-n // K)
    n_pad = rows * K

    if n_pad != n:
        pad = n_pad - n

        def padp(x):
            return jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (pad,), dtype=x.dtype)], axis=-1
            )

        px_py_pz = jax.tree_util.tree_map(padp, px_py_pz)
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((F.NLIMBS, pad), dtype=jnp.uint32)], axis=-1
        )

    digits = digits_from_limbs(scalars, c)  # (windows, n_pad), LSB window first
    windows = digits.shape[0]
    digits = digits.reshape(windows, rows, K).astype(jnp.int32)
    digits = digits[::-1]  # MSB window first for Horner

    is_g2 = isinstance(px_py_pz[0], tuple)
    lane_ids = jnp.arange(K, dtype=jnp.int32)

    bucket_proto = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape[:-1] + (B * K,), dtype=x.dtype), px_py_pz
    )

    def window_sum(dw):
        """dw: (rows, K) digits -> weighted bucket sum, batch dim 1."""
        ident = point_identity_like(bucket_proto[0], ops, is_g2)

        def body(step, buckets):
            idx = dw[step] * K + lane_ids  # (K,) unique within the step
            acc = jax.tree_util.tree_map(lambda x: x[..., idx], buckets)
            pt = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, step * K, K, -1),
                px_py_pz,
            )
            new = point_add(acc, pt, ops)
            return jax.tree_util.tree_map(
                lambda b, v: b.at[..., idx].set(v, unique_indices=True),
                buckets, new,
            )

        buckets = jax.lax.fori_loop(0, rows, body, ident)
        buckets = jax.tree_util.tree_map(
            lambda x: x.reshape(x.shape[:-1] + (B, K)), buckets
        )
        # reduce the K lane-bucket arrays with a scan (1 add in the graph)
        lanes_first = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x, -1, 0), buckets
        )  # (K, .., B)
        first = jax.tree_util.tree_map(lambda x: x[0], lanes_first)
        rest = jax.tree_util.tree_map(lambda x: x[1:], lanes_first)

        def lane_body(acc, lane):
            return point_add(acc, lane, ops), None

        lane_sum, _ = jax.lax.scan(lane_body, first, rest)  # (.., B)
        return _weighted_bucket_sum(lane_sum, ops, B)  # (.., 1)

    # Horner over windows, MSB first; one compiled window body (lax.scan)
    def scan_body(carry, dw):
        shifted = jax.lax.fori_loop(
            0, c, lambda _, p: point_double(p, ops), carry
        )
        return point_add(shifted, window_sum(dw), ops), None

    ident1 = point_identity_like(
        jax.tree_util.tree_map(lambda x: x[..., :1], px_py_pz)[0], ops, is_g2
    )
    result, _ = jax.lax.scan(scan_body, ident1, digits)
    return result
