"""Multi-chip collective correctness on the 8-device virtual CPU mesh."""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import za_tpu.engine.ec as EC
import za_tpu.engine.field as F
import za_tpu.engine.mesh as MESH
from za_tpu.curve import G1_GEN, R, g1_mul
from za_tpu.engine.ec import G1_OPS
from za_tpu.groth16.domain import Domain
from za_tpu.groth16.prove import HostEngine

rng = random.Random(5)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return MESH.make_mesh(8)


@pytest.mark.slow
def test_sharded_ntt_roundtrip(mesh):
    n = 256
    dd = MESH.ShardedDomain(n, 8)
    dom = Domain(n)
    coeffs = [rng.randrange(R) for _ in range(n)]
    cm = F.ints_to_limbs([F.FR.to_mont_int(c) for c in coeffs])
    fwd = MESH.sharded_ntt_fn(mesh, dd, inverse=False)(cm)
    got = [F.FR.from_mont_int(v) for v in F.limbs_to_ints(np.asarray(fwd))]
    assert got == dom.ntt(coeffs)
    back = MESH.sharded_ntt_fn(mesh, dd, inverse=True)(fwd)
    got = [F.FR.from_mont_int(v) for v in F.limbs_to_ints(np.asarray(back))]
    assert got == coeffs


@pytest.mark.slow
def test_sharded_msm_matches_host(mesh):
    host = HostEngine()
    n = 32
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    pts[2] = None
    scs = [rng.randrange(R) for _ in range(n)]
    fn = MESH.sharded_msm_fn(mesh, G1_OPS, c=4, lanes=2, is_g2=False)
    X, Y, Z = fn(EC.g1_points_to_device(pts), F.ints_to_limbs(scs))
    got = EC.g1_point_from_device(np.asarray(X), np.asarray(Y), np.asarray(Z))
    assert got == host.msm_g1(pts, scs)
