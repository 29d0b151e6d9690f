"""Isolate the XLA RNS pieces at tree-MSM widths: mont_mul chain
throughput, one affine level, one batch_inv, selection."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import za_tpu.engine.msm_tree as MT
import za_tpu.engine.rns as RNS
from za_tpu.engine.engine import _enable_compilation_cache

_enable_compilation_cache()

K = int(os.environ.get("PT_K", str(3 * 64 * (1 << 14))))  # level-0 pairs


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(name, fn, *args, reps=3, work_muls=None):
    fn(*args)
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    rate = f"  ({work_muls/dt/1e6:.0f}M muls/s)" if work_muls else ""
    print(f"{name}: {dt*1000:.1f} ms{rate}", flush=True)
    return dt


ctx = RNS.RQ
fld = MT.FqAdapter(ctx)
import random

rng = random.Random(9)
base = ctx.ints_to_rns(
    [ctx.to_mont_int(rng.randrange(1, ctx.modulus)) for _ in range(512)]
)
a = jnp.asarray(
    np.broadcast_to(base[:, :, None], (35, 512, K // 512)).reshape(35, K)
)
print(f"K={K} ({K*140/1e6:.0f} MB per operand)", flush=True)

mul1 = jax.jit(lambda x, y: RNS.mont_mul_rns(x, y, ctx))
timeit("mont_mul x1", mul1, a, a, work_muls=K)


def chain8(x, y):
    for _ in range(8):
        x = RNS.mont_mul_rns(x, y, ctx)
    return x


timeit("mont_mul x8 chain", jax.jit(chain8), a, a, work_muls=8 * K)

binv = jax.jit(lambda x: MT.batch_inv(x, fld))
timeit("batch_inv", binv, a, work_muls=3 * K)


def lvl(x, y):
    inf = jnp.zeros(x.shape[1:], dtype=bool)
    return MT._affine_level(x, y, inf, fld, 4, 12, False)


timeit("affine_level (incl inv)", jax.jit(lvl), a, a,
       work_muls=3 * K + 3 * (K // 2))

# plain channel product only (no base extension): the VPU-only part
chp = jax.jit(lambda x, y: RNS.ch_mul(x, y, ctx))
timeit("ch_mul (VPU only)", chp, a, a, work_muls=K)
