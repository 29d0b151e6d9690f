"""TpuEngine: the prover-facing compute facade.

Implements the HostEngine interface (msm_g1 / msm_g2 / h_coeffs) on
JAX devices: witness R1CS evaluation as a segment-sum sparse matvec,
the QAP quotient via device coset NTT, and Pippenger MSMs. Pure-jnp
kernels run identically on the CPU backend (tests: 8 virtual devices)
and TPU; jitted callables are cached per shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import G1Point, G2Point, R
from ..groth16.domain import Domain
from ..groth16.r1cs import R1CS
from . import ec, field as F, msm as MSM, ntt as NTT
from .field import FR


def _pad_pow2ish(n: int, align: int = 8) -> int:
    """Round up to the next power of two: MSM shapes collapse onto a
    handful of sizes so the a/b1/l/h queries share compiled kernels."""
    size = align
    while size < n:
        size <<= 1
    return size


def _enable_compilation_cache():
    """Persist XLA compilations across processes (kernels are reused
    per pk shape; first-compile cost is paid once per machine)."""
    import os

    cache_dir = os.environ.get(
        "ZA_TPU_JAX_CACHE", os.path.expanduser("~/.cache/za_tpu_jax")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 -- cache is best-effort
        pass


class TpuEngine:
    """Stateless facade; caches jitted kernels and device domains.

    lanes/window default to throughput-oriented auto sizing; the
    reduction style defaults to wide tree/associative passes on TPU
    (sequential loop iterations are expensive there) and small-graph
    scans elsewhere (XLA:CPU compile time dominates in tests)."""

    def __init__(self, lanes: int | None = None, window: int | None = None,
                 reduce_style: str | None = None):
        _enable_compilation_cache()
        self.lanes = lanes
        self.window = window
        if reduce_style is None:
            reduce_style = "hybrid" if jax.default_backend() == "tpu" else "scan"
        self.reduce_style = reduce_style
        self.layout = "packed" if jax.default_backend() == "tpu" else "limb"
        self._domains: dict[int, NTT.DeviceDomain] = {}
        self._jit_cache: dict = {}

    # -- MSM -----------------------------------------------------------------

    def _msm_params(self, n: int, is_g2: bool) -> tuple[int, int]:
        c, lanes = MSM.auto_params(n, is_g2=is_g2)
        if self.window is not None:
            c = self.window
        if self.lanes is not None:
            lanes = self.lanes
        return c, lanes

    def _msm_jit(self, kind: str, n: int, c: int, lanes: int):
        key = (kind, n, c, lanes, self.reduce_style)
        if key not in self._jit_cache:
            ops = ec.G1_OPS if kind == "g1" else ec.G2_OPS

            def run(points, scalars):
                return MSM.msm_limbs(
                    points, scalars, ops, c=c, lanes=lanes,
                    reduce_style=self.reduce_style, layout=self.layout,
                )

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def msm_g1(self, points: list[G1Point], scalars: list[int]) -> G1Point:
        assert len(points) == len(scalars)
        n = _pad_pow2ish(len(points))
        pts = list(points) + [None] * (n - len(points))
        scs = [s % R for s in scalars] + [0] * (n - len(scalars))
        dev_pts = ec.g1_points_to_device(pts)
        dev_scs = F.ints_to_limbs(scs)
        c, lanes = self._msm_params(n, is_g2=False)
        X, Y, Z = self._msm_jit("g1", n, c, lanes)(dev_pts, dev_scs)
        return ec.g1_point_from_device(X, Y, Z)

    def msm_g2(self, points: list[G2Point], scalars: list[int]) -> G2Point:
        assert len(points) == len(scalars)
        n = _pad_pow2ish(len(points))
        pts = list(points) + [None] * (n - len(points))
        scs = [s % R for s in scalars] + [0] * (n - len(scalars))
        dev_pts = ec.g2_points_to_device(pts)
        dev_scs = F.ints_to_limbs(scs)
        c, lanes = self._msm_params(n, is_g2=True)
        X, Y, Z = self._msm_jit("g2", n, c, lanes)(dev_pts, dev_scs)
        return ec.g2_point_from_device(X, Y, Z)

    # -- fixed-base scalar multiplication (trusted setup) --------------------

    def _fixed_base_jit(self, kind: str, n: int, c: int):
        key = ("fb", kind, n, c)
        if key not in self._jit_cache:
            ops = ec.G1_OPS if kind == "g1" else ec.G2_OPS

            def run(base, scalars):
                table = MSM.fixed_base_table(base, ops, c)
                pts = MSM.fixed_base_msm(table, scalars, ops, c)
                if kind == "g1":
                    return ec.normalize_g1(*pts)
                return ec.normalize_g2(*pts)

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def fixed_base_g1(self, scalars: list[int], c: int = 8) -> list[G1Point]:
        """[s_i * G1 for s_i] -- the setup's pk-query builder."""
        from ..curve import G1_GEN

        n = _pad_pow2ish(len(scalars))
        scs = [s % R for s in scalars] + [0] * (n - len(scalars))
        base = ec.g1_points_to_device([G1_GEN])
        x, y, z = self._fixed_base_jit("g1", n, c)(base, F.ints_to_limbs(scs))
        return ec.g1_batch_from_device(x, y, z)[: len(scalars)]

    def fixed_base_g2(self, scalars: list[int], c: int = 8) -> list[G2Point]:
        from ..curve import G2_GEN

        n = _pad_pow2ish(len(scalars))
        scs = [s % R for s in scalars] + [0] * (n - len(scalars))
        base = ec.g2_points_to_device([G2_GEN])
        x, y, z = self._fixed_base_jit("g2", n, c)(base, F.ints_to_limbs(scs))
        return ec.g2_batch_from_device(x, y, z)[: len(scalars)]

    # -- QAP h(x) ------------------------------------------------------------

    def _domain(self, size: int) -> NTT.DeviceDomain:
        if size not in self._domains:
            self._domains[size] = NTT.DeviceDomain(size)
        return self._domains[size]

    def _h_jit(self, m: int, nnz_key):
        key = ("h", m, nnz_key)
        if key not in self._jit_cache:
            dom = self._domain(m)

            def run(z_mont, a_ent, b_ent, c_ent, az0, bz0, cz0):
                def matvec(coeffs, colidx, rowidx, base):
                    prod = F.mont_mul(coeffs, z_mont[:, colidx], FR)
                    sums = jax.ops.segment_sum(
                        prod.T, rowidx, num_segments=m
                    ).T  # (16, m) digit sums < 2^32
                    # widen to 32 columns (< 2^17 digits) then REDC -> plain
                    lo = sums & F.MASK
                    hi = sums >> F.LIMB_BITS
                    wide = jnp.zeros((2 * F.NLIMBS, m), dtype=jnp.uint32)
                    wide = wide.at[: F.NLIMBS].add(lo)
                    wide = wide.at[1 : F.NLIMBS + 1].add(hi)
                    plain = F.redc_wide(wide, FR)
                    return F.add_mod(F.to_mont(plain, FR), base, FR)

                az = matvec(*a_ent, az0)
                bz = matvec(*b_ent, bz0)
                cz = matvec(*c_ent, cz0)

                a_c = NTT.coset_ntt(dom, NTT.intt(dom, az))
                b_c = NTT.coset_ntt(dom, NTT.intt(dom, bz))
                c_c = NTT.coset_ntt(dom, NTT.intt(dom, cz))
                ab = F.mont_mul(a_c, b_c, FR)
                hc = F.sub_mod(ab, c_c, FR)
                zi = jnp.broadcast_to(dom.z_coset_inv[:, None], hc.shape)
                hc = F.mont_mul(hc, zi, FR)
                h = NTT.coset_intt(dom, hc)
                return F.from_mont(h, FR)

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def h_coeffs(self, r1cs: R1CS, z: list[int], domain: Domain) -> list[int]:
        m = domain.size

        def pack_rows(rows):
            coeffs, cols, rowids = [], [], []
            for k, row in enumerate(rows):
                for var, coeff in row:
                    coeffs.append(FR.to_mont_int(coeff))
                    cols.append(var)
                    rowids.append(k)
            if not coeffs:  # keep shapes non-empty
                coeffs, cols, rowids = [0], [0], [0]
            return (
                jnp.asarray(F.ints_to_limbs(coeffs)),
                jnp.asarray(np.array(cols, dtype=np.int32)),
                jnp.asarray(np.array(rowids, dtype=np.int32)),
            )

        a_ent = pack_rows(r1cs.a_rows)
        b_ent = pack_rows(r1cs.b_rows)
        c_ent = pack_rows(r1cs.c_rows)

        z_mont = jnp.asarray(
            F.ints_to_limbs([FR.to_mont_int(v % R) for v in z])
        )

        # input-preservation rows: az[n+i] = z_i (bellman domain layout)
        n = r1cs.num_constraints
        az0 = np.zeros((F.NLIMBS, m), dtype=np.uint32)
        az0[:, n : n + r1cs.num_inputs] = np.asarray(z_mont)[
            :, : r1cs.num_inputs
        ]
        zero0 = jnp.zeros((F.NLIMBS, m), dtype=jnp.uint32)

        nnz_key = (a_ent[1].shape[0], b_ent[1].shape[0], c_ent[1].shape[0])
        h = self._h_jit(m, nnz_key)(
            z_mont, a_ent, b_ent, c_ent, jnp.asarray(az0), zero0, zero0
        )
        h_ints = F.limbs_to_ints(np.asarray(h))
        assert h_ints[m - 1] == 0, "h(x) degree overflow: witness unsatisfied?"
        return h_ints[: m - 1]
