"""Standalone repro: XLA:TPU miscompile family at lanes=256 in the XLA
RNS signed-dense MSM (za_tpu.engine.msm.msm_signed_dense).

Symptom (first seen round 3 on the tunneled v5e backend): with
lanes=256 the fused select(jnp.where chain)+point-add graph produces
corrupted channel residues -- the final MSM points disagree with the
exact host model -- while the identical graph at lanes<=128 matches,
and every sub-graph in isolation matches at either width.  The same
fusion-bug family corrupted nested-tuple (c0, c1) Fq2 pytrees before
the flat-Fq2 layout (commit aa72521); the engine therefore clamps the
XLA path to 128 lanes (engine.py _grouped_jit).

Run on a TPU host:  python tools/repro_lanes256.py
Expected on an affected XLA:TPU:  "lanes=128 OK" then "lanes=256
MISMATCH ..."; on a fixed toolchain both report OK and the clamp can
be lifted.

Status note (round 4): the production TPU MSM moved to the fused
Pallas kernel (pallas_msm_rns.py), which compiles through Mosaic and
is unaffected; there the measured difference between 128 and 256
lanes is noise (62.8 vs 64.2 M point-adds/s at n=2^18), so the XLA
clamp costs nothing and stays as the safe fallback setting.
"""

import random
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import za_tpu.engine.ec as ec  # noqa: E402
import za_tpu.engine.field as F  # noqa: E402
import za_tpu.engine.msm as MSM  # noqa: E402
from za_tpu.curve import G1_GEN, R, g1_mul  # noqa: E402
from za_tpu.groth16.prove import HostEngine  # noqa: E402


def main():
    print("backend:", jax.default_backend())
    rng = random.Random(1234)
    n, m = 4096, 1
    base = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(64)]
    pts = [base[i % 64] for i in range(n)]
    scs = [[rng.randrange(R) for _ in range(n)] for _ in range(m)]

    staged = ec.g1_points_to_rns(pts)
    points = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:, None], (35, m, n)), staged
    )
    sc_l = jnp.stack(
        [jnp.asarray(F.ints_to_limbs(s)) for s in scs], axis=1
    )
    ops = ec.make_g1_ops_rns()
    want = HostEngine().msm_g1(pts, scs[0])

    status = 0
    for lanes in (128, 256):
        f = jax.jit(
            lambda p, s, L=lanes: MSM.msm_signed_dense(
                p, s, ops, c=4, lanes=L
            )
        )
        X, Y, Z = f(points, sc_l)
        got = ec.g1_point_from_rns(
            np.asarray(X)[:, 0], np.asarray(Y)[:, 0], np.asarray(Z)[:, 0]
        )
        if got == want:
            print(f"lanes={lanes} OK")
        else:
            print(f"lanes={lanes} MISMATCH: got {got}")
            status = 1
    return status


if __name__ == "__main__":
    sys.exit(main())
