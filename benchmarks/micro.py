"""Per-kernel speed-of-light microbenchmarks (SURVEY.md §5 tracing).

Measures the prover's building blocks on the attached chip against
hardware ceilings so kernel regressions show up as numbers. The
tunneled backend does NOT synchronize on block_until_ready; a d2h copy
of one element is the only reliable barrier (see engine docstrings).

Run: python benchmarks/micro.py            # prints a table + JSON
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from za_tpu.engine.engine import (  # noqa: E402
    _enable_compilation_cache, _warm_d2h_path,
)

_enable_compilation_cache()
_warm_d2h_path()


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    sync(out)  # compile + first run
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import za_tpu.engine.ec as EC
    import za_tpu.engine.field as F
    import za_tpu.engine.rns as RNS
    from za_tpu.engine.field import FQ
    from za_tpu.engine.rns import RQ

    rng = np.random.RandomState(7)
    rows = []

    def report(name, dt, rate, unit):
        rows.append({"kernel": name, "ms": round(dt * 1e3, 3),
                     "rate": round(rate, 2), "unit": unit})
        print(f"{name:28s} {dt*1e3:9.3f} ms  {rate:12.2f} {unit}",
              flush=True)

    # raw VPU / MXU ceilings
    n = 1 << 20
    a32 = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n), dtype=np.uint32))
    b32 = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n), dtype=np.uint32))

    @jax.jit
    def chain_mul(a, b):
        x = a
        for _ in range(32):
            x = x * b + a
        return x

    dt = timeit(chain_mul, a32, b32)
    report("vpu u32 mul+add (chained)", dt, 32 * 2 * 16 * n / dt / 1e12,
           "Tops/s")

    A8 = jnp.asarray(rng.randint(-127, 127, size=(4096, 512), dtype=np.int8))
    B8 = jnp.asarray(rng.randint(-127, 127, size=(512, 4096), dtype=np.int8))

    @jax.jit
    def mm_i8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    dt = timeit(mm_i8, A8, B8, iters=20)
    report("mxu int8 matmul", dt, 2 * 4096 * 512 * 4096 / dt / 1e12,
           "Tops/s")

    # limb field core
    nn = 1 << 18
    fa = jnp.asarray(rng.randint(0, 1 << 16, size=(16, nn), dtype=np.uint32))
    fb = jnp.asarray(rng.randint(0, 1 << 16, size=(16, nn), dtype=np.uint32))

    @jax.jit
    def chain_mont_limb(a, b):
        x = a
        for _ in range(8):
            x = F.mont_mul(x, b, FQ)
        return x

    dt = timeit(chain_mont_limb, fa, fb)
    report("limb mont_mul (chained x8)", dt, 8 * nn / dt / 1e6, "Mmul/s")

    # RNS field core
    ra = jnp.asarray(rng.randint(0, 65000, size=(35, nn), dtype=np.uint32))
    rb = jnp.asarray(rng.randint(0, 65000, size=(35, nn), dtype=np.uint32))

    @jax.jit
    def chain_mont_rns(a, b):
        x = a
        for _ in range(8):
            x = RNS.mont_mul_rns(x, b, RQ)
        return x

    dt = timeit(chain_mont_rns, ra, rb)
    report("rns mont_mul (chained x8)", dt, 8 * nn / dt / 1e6, "Mmul/s")

    # point adds (both representations)
    def rpt_limb(k):
        return tuple(
            jnp.asarray(rng.randint(0, 1 << 16, size=(16, k),
                                    dtype=np.uint32))
            for _ in range(3))

    def rpt_rns(k, g2=False):
        shape = (35, 2, k) if g2 else (35, k)
        return tuple(
            jnp.asarray(rng.randint(0, 65000, size=shape, dtype=np.uint32))
            for _ in range(3))

    nn = 1 << 17
    p1, p2 = rpt_rns(nn), rpt_rns(nn)

    @jax.jit
    def chain_g1_rns(p, q):
        x = p
        for _ in range(4):
            x = EC.point_add(x, q, EC.make_g1_ops_rns())
        return x

    dt = timeit(chain_g1_rns, p1, p2)
    report("rns g1 point_add (x4)", dt, 4 * nn / dt / 1e6, "Madd/s")

    q1, q2 = rpt_rns(nn // 2, True), rpt_rns(nn // 2, True)

    @jax.jit
    def chain_g2_rns(p, q):
        x = p
        for _ in range(4):
            x = EC.point_add(x, q, EC.make_g2_ops_rns())
        return x

    dt = timeit(chain_g2_rns, q1, q2)
    report("rns g2 point_add (x4)", dt, 4 * (nn // 2) / dt / 1e6, "Madd/s")

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
