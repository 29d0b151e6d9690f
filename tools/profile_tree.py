"""Profile the batch-affine tree MSM pieces on the attached chip.

Times (warm): full tree at several affine-level counts, the Pallas
signed-dense kernel on the same shape, one batch_inv, one Fermat.
Timing barrier: one-element d2h copy (block_until_ready doesn't
synchronize on the tunneled backend -- docs/PERF.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import za_tpu.engine.ec as EC
import za_tpu.engine.field as F
import za_tpu.engine.msm as MSM
import za_tpu.engine.msm_tree as MT
import za_tpu.engine.rns as RNS
from za_tpu.curve import G1_GEN, R, g1_mul
from za_tpu.engine.engine import TpuEngine, _enable_compilation_cache

_enable_compilation_cache()

LOG2N = int(os.environ.get("PT_LOG2N", "14"))
M = int(os.environ.get("PT_M", "3"))
n = 1 << LOG2N


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(name, fn, *args, reps=3):
    fn(*args)  # compile
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.1f} ms")
    return dt


import random

rng = random.Random(5)
pool = [g1_mul(G1_GEN, rng.randrange(1, 1 << 62)) for _ in range(67)]
points = [pool[i % 67] for i in range(n)]
scalars = [rng.randrange(1, R) for _ in range(n)]

eng = TpuEngine()
print(f"n=2^{LOG2N} M={M}", flush=True)

t0 = time.time()
tabs = eng.stage_g1_affine([points] * M, n_pad=n)
sync(tabs.tx)
print(f"stage tables: {time.time()-t0:.1f}s", flush=True)

sc = jnp.asarray(F.ints_to_limbs([s % R for s in scalars]))
sc = jnp.broadcast_to(sc[:, None, :], (16, M, n))
ops = EC.make_g1_ops_rns()

import za_tpu.engine.pallas_tree as PTF

fn = jax.jit(
    lambda tx, ty, ident, s: PTF.msm_tree_fused(
        MT.AffineTables(tx=tx, ty=ty, ident=ident, n=0, is_g2=False),
        s, ops,
    )
)
timeit("tree fused (pallas)", fn, tabs.tx, tabs.ty, tabs.ident, sc)

if os.environ.get("PT_XLA_TREE", "0") == "1":
    fn = jax.jit(
        lambda tx, ty, ident, s: MT.msm_affine_tree(
            MT.AffineTables(tx=tx, ty=ty, ident=ident, n=0,
                            is_g2=False), s, ops
        )
    )
    timeit("tree XLA", fn, tabs.tx, tabs.ty, tabs.ident, sc)

# pallas kernel comparison at same (M, n)
staged = eng.stage_g1_stacked([points] * M)
kern = eng._grouped_jit("g1", M, n, 4, 128)
timeit("pallas kernel", kern, staged, sc)

# isolated batch_inv at level-0 width
fld = MT.FqAdapter()
K = M * 64 * (n // 2)
d = jnp.asarray(
    RNS.RQ.ints_to_rns([rng.randrange(1, RNS.RQ.modulus)
                        for _ in range(256)])
)
d = jnp.broadcast_to(d[:, :, None], (35, 256, K // 256)).reshape(35, K)
binv = jax.jit(lambda x: MT.batch_inv(x, fld))
timeit(f"batch_inv K={K}", binv, d)

nar = jnp.asarray(
    RNS.RQ.ints_to_rns([rng.randrange(1, RNS.RQ.modulus)
                        for _ in range(512)])
)
fer = jax.jit(lambda x: fld.fermat_inv(x))
timeit("fermat width=512", fer, nar)
