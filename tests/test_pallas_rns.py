"""Differential tests: fused Pallas RNS MSM vs the XLA RNS MSM and the
exact host engine (interpret mode on the CPU backend; the same kernel
compiles on TPU via Mosaic)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import za_tpu.engine.ec as ec
import za_tpu.engine.field as F
import za_tpu.engine.msm as MSM
from za_tpu.curve import G1_GEN, G2_GEN, R, g1_mul, g2_mul
from za_tpu.engine import pallas_msm_rns as PMR
from za_tpu.groth16.prove import HostEngine


def _scalars(rng, m, n):
    return [[rng.randrange(R) for _ in range(n)] for _ in range(m)]


@pytest.mark.parametrize(
    "n,m,lanes",
    [(64, 1, 64),
     pytest.param(96, 2, 32, marks=pytest.mark.slow)],
)
def test_pallas_g1_matches_host(n, m, lanes):
    rng = random.Random(7)
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    scs = _scalars(rng, m, n)

    staged = ec.g1_points_to_rns(pts)
    points = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:, None], (PMR.NCH, m, n)), staged
    )
    sc_l = jnp.stack([jnp.asarray(F.ints_to_limbs(s)) for s in scs], axis=1)

    ops = ec.make_g1_ops_rns()
    X, Y, Z = PMR.msm_signed_dense_pallas(
        points, sc_l, ops, lanes=lanes, interpret=True
    )
    host = HostEngine()
    for i in range(m):
        got = ec.g1_point_from_rns(
            np.asarray(X)[:, i], np.asarray(Y)[:, i], np.asarray(Z)[:, i]
        )
        assert got == host.msm_g1(pts, scs[i])


@pytest.mark.slow
def test_pallas_g1_matches_xla():
    rng = random.Random(11)
    n, m, lanes = 128, 2, 32
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    # include edge scalars: 0, 1, r-1, and a top-heavy value
    scs = _scalars(rng, m, n)
    scs[0][0] = 0
    scs[0][1] = 1
    scs[0][2] = R - 1

    staged = ec.g1_points_to_rns(pts)
    points = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:, None], (PMR.NCH, m, n)), staged
    )
    sc_l = jnp.stack([jnp.asarray(F.ints_to_limbs(s)) for s in scs], axis=1)

    ops = ec.make_g1_ops_rns()
    Xp, Yp, Zp = PMR.msm_signed_dense_pallas(
        points, sc_l, ops, lanes=lanes, interpret=True
    )
    Xx, Yx, Zx = MSM.msm_signed_dense(points, sc_l, ops, c=4, lanes=lanes)
    for i in range(m):
        got = ec.g1_point_from_rns(
            np.asarray(Xp)[:, i], np.asarray(Yp)[:, i], np.asarray(Zp)[:, i]
        )
        want = ec.g1_point_from_rns(
            np.asarray(Xx)[:, i], np.asarray(Yx)[:, i], np.asarray(Zx)[:, i]
        )
        assert got == want


@pytest.mark.slow
def test_pallas_g2_matches_host():
    rng = random.Random(13)
    n, m, lanes = 64, 1, 32
    pts = [g2_mul(G2_GEN, rng.randrange(1, R)) for _ in range(n)]
    scs = _scalars(rng, m, n)
    scs[0][0] = 0

    staged = ec.g2_points_to_rns(pts)
    points = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:, :, None], (PMR.NCH, 2, m, n)),
        staged,
    )
    sc_l = jnp.stack([jnp.asarray(F.ints_to_limbs(s)) for s in scs], axis=1)

    ops = ec.make_g2_ops_rns()
    X, Y, Z = PMR.msm_signed_dense_pallas(
        points, sc_l, ops, lanes=lanes, interpret=True
    )
    host = HostEngine()
    for i in range(m):
        got = ec.g2_point_from_rns(
            np.asarray(X)[:, :, i], np.asarray(Y)[:, :, i],
            np.asarray(Z)[:, :, i],
        )
        assert got == host.msm_g2(pts, scs[i])

