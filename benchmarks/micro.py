"""Per-kernel speed-of-light microbenchmarks (SURVEY.md §5 tracing item).

Measures the building blocks of the prover's device compute on the
attached chip and prints ops/s next to hardware ceilings, so kernel
regressions and inefficiencies are visible in numbers rather than
prose. Run: python benchmarks/micro.py [--quick]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import za_tpu.engine.ec as EC
    import za_tpu.engine.field as F
    from za_tpu.engine.field import FQ

    rng = np.random.RandomState(7)
    n = 1 << 16

    # -- raw VPU u32 multiply ------------------------------------------------
    a32 = jnp.asarray(rng.randint(0, 1 << 16, size=(256, n), dtype=np.uint32))
    b32 = jnp.asarray(rng.randint(0, 1 << 16, size=(256, n), dtype=np.uint32))

    @jax.jit
    def mul_u32(a, b):
        return a * b + a

    dt = timeit(mul_u32, a32, b32)
    ops = 2 * 256 * n
    print(f"u32 mul+add      : {dt*1e3:8.3f} ms  {ops/dt/1e12:8.3f} Tops/s")

    @jax.jit
    def mul_u16_widen(a, b):
        return (a & 0xFFFF) * (b & 0xFFFF)

    dt = timeit(mul_u16_widen, a32, b32)
    ops = 256 * n
    print(f"u32(16bit) mul   : {dt*1e3:8.3f} ms  {ops/dt/1e12:8.3f} Tops/s")

    # f32 multiply for comparison
    af = a32.astype(jnp.float32)
    bf = b32.astype(jnp.float32)

    @jax.jit
    def mul_f32(a, b):
        return a * b + a

    dt = timeit(mul_f32, af, bf)
    ops = 2 * 256 * n
    print(f"f32 mul+add      : {dt*1e3:8.3f} ms  {ops/dt/1e12:8.3f} Tflop/s")

    # -- int8 MXU matmul ------------------------------------------------------
    A8 = jnp.asarray(rng.randint(-127, 127, size=(4096, 512), dtype=np.int8))
    B8 = jnp.asarray(rng.randint(-127, 127, size=(512, 4096), dtype=np.int8))

    @jax.jit
    def mm_i8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    dt = timeit(mm_i8, A8, B8)
    ops = 2 * 4096 * 512 * 4096
    print(f"int8 MXU matmul  : {dt*1e3:8.3f} ms  {ops/dt/1e12:8.3f} Tops/s")

    # bf16 MXU matmul
    Abf = jnp.asarray(rng.randn(4096, 512)).astype(jnp.bfloat16)
    Bbf = jnp.asarray(rng.randn(512, 4096)).astype(jnp.bfloat16)

    @jax.jit
    def mm_bf(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dt = timeit(mm_bf, Abf, Bbf)
    print(f"bf16 MXU matmul  : {dt*1e3:8.3f} ms  {ops/dt/1e12:8.3f} Tflop/s")

    # -- field ops -------------------------------------------------------------
    fa = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n), dtype=np.uint32))
    fb = jnp.asarray(rng.randint(0, 1 << 16, size=(16, n), dtype=np.uint32))

    mont = jax.jit(lambda a, b: F.mont_mul(a, b, FQ))
    dt = timeit(mont, fa, fb)
    print(f"mont_mul (16,{n}): {dt*1e3:8.3f} ms  {n/dt/1e6:8.2f} Mmul/s")

    addm = jax.jit(lambda a, b: F.add_mod(a, b, FQ))
    dt = timeit(addm, fa, fb)
    print(f"add_mod          : {dt*1e3:8.3f} ms  {n/dt/1e6:8.2f} Madd/s")

    cp = jax.jit(F.carry_prop)
    wide = jnp.asarray(
        rng.randint(0, 1 << 20, size=(32, n), dtype=np.uint32))
    dt = timeit(cp, wide)
    print(f"carry_prop(32)   : {dt*1e3:8.3f} ms  {n/dt/1e6:8.2f} M/s")

    mw = jax.jit(F.mul_wide)
    dt = timeit(mw, fa, fb)
    print(f"mul_wide         : {dt*1e3:8.3f} ms  {n/dt/1e6:8.2f} M/s")

    # -- point add -------------------------------------------------------------
    def rand_pt(k):
        return tuple(
            jnp.asarray(rng.randint(0, 1 << 16, size=(16, k), dtype=np.uint32))
            for _ in range(3)
        )

    p1, p2 = rand_pt(n), rand_pt(n)
    padd = jax.jit(lambda p, q: EC.point_add(p, q, EC.G1_OPS))
    dt = timeit(padd, p1, p2)
    print(f"g1 point_add     : {dt*1e3:8.3f} ms  {n/dt/1e6:8.2f} Madd/s")

    def rand_pt2(k):
        return tuple(
            (jnp.asarray(rng.randint(0, 1 << 16, size=(16, k), dtype=np.uint32)),
             jnp.asarray(rng.randint(0, 1 << 16, size=(16, k), dtype=np.uint32)))
            for _ in range(3)
        )

    q1, q2 = rand_pt2(n), rand_pt2(n)
    padd2 = jax.jit(lambda p, q: EC.point_add(p, q, EC.G2_OPS))
    dt = timeit(padd2, q1, q2)
    print(f"g2 point_add     : {dt*1e3:8.3f} ms  {n/dt/1e6:8.2f} Madd/s")


if __name__ == "__main__":
    main()
