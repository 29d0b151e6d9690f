"""Groth16 proving system over BN254.

From-scratch replacement for the reference's external bellman_ce engine
(SURVEY.md section 2.3): R1CS -> QAP, trusted setup, prover (coset
FFT h(x) + 5 multi-scalar multiplications), and pairing verification.
Compute routes through a pluggable engine: the host engine (exact
Python ints, golden reference) or the TPU engine (za_tpu.engine --
JAX/XLA/Pallas limb kernels).
"""

from .r1cs import R1CS  # noqa: F401
from .setup import Groth16Parameters, VerifyingKey, generate_parameters  # noqa: F401
from .prove import Proof, prove  # noqa: F401
from .verify import verify_proof  # noqa: F401
