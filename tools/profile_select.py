"""Isolate the fused-tree chunk pipeline pieces at real prove shapes:
XLA digit-select, each Pallas tree level, and the full chunk_partials,
to size the select-fusion headroom (docs/PERF.md next-headroom #1).

Shapes mirror the 2^20 prove: chunk S=ZA_TREE_CHUNK, M queries, 64
signed radix-16 windows."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import za_tpu.engine.msm_tree as MT
import za_tpu.engine.pallas_tree as PTF
import za_tpu.engine.rns as RNS
import za_tpu.engine.ec as EC
from za_tpu.engine.engine import _enable_compilation_cache

_enable_compilation_cache()

S = int(os.environ.get("PS_S", "16384"))
M = int(os.environ.get("PS_M", "3"))
W = PTF.WIN


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(name, fn, *args, reps=3):
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.1f} ms", flush=True)
    return dt


rng = np.random.default_rng(7)
tabx = jnp.asarray(rng.integers(0, 1 << 16, (8, 35, M, S), dtype=np.uint16))
taby = jnp.asarray(rng.integers(0, 1 << 16, (8, 35, M, S), dtype=np.uint16))
d = jnp.asarray(rng.integers(-8, 9, (W, M, S), dtype=np.int8))

print(f"S={S} M={M} W={W}", flush=True)

sel = jax.jit(PTF._select_chunk)
timeit("select_chunk (XLA)", sel, tabx, taby, d)

x, y, inf = sel(tabx, taby, d)
plan = MT._level_plan(max(S.bit_length() - 1, 1), False)
n_k = S
lvl = 0
tot_lvl = 0.0
while n_k > 128:
    bx, by, reset = plan[lvl]
    step = jax.jit(
        lambda a, b, c, bx=bx, by=by, reset=reset: PTF.tree_level(
            a, b, c, bx, by, reset
        )
    )
    dt = timeit(f"tree_level {lvl} ({n_k}->{n_k//2})", step, x, y, inf)
    tot_lvl += dt
    x, y, inf = step(x, y, inf)
    n_k //= 2
    lvl += 1
print(f"levels total: {tot_lvl*1000:.1f} ms", flush=True)

ops = EC.make_g1_ops_rns()
ident = jnp.zeros((1, M, S), dtype=bool)
sc = jnp.asarray(rng.integers(0, 1 << 16, (16, M, S), dtype=np.uint32))
full = jax.jit(lambda tx, ty, idn, s: PTF.msm_tree_fused(
    MT.AffineTables(tx=tx, ty=ty, ident=idn, n=M * S, is_g2=False),
    s, ops))
timeit("full chunk msm_tree_fused", full, tabx[None], taby[None], ident, sc)
