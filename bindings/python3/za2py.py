"""Python binding: setup / prove / verify / verbose.

The reference exposes these through a cpython cdylib (binding/python3);
with a Python-native core they are direct re-exports. Kept as a module
so binding consumers have the same 4-function surface everywhere.
"""

import logging

from za_tpu.groth16 import helper
from za_tpu.groth16.format import flatten_json


def verbose(on: bool) -> None:
    logging.getLogger("za_tpu").setLevel(
        logging.INFO if on else logging.WARNING
    )


def setup(circuit_path: str, pk_path: str, verifier_type: str) -> str:
    """Returns the verifier artifact (json or solidity)."""
    return helper.setup(circuit_path, pk_path, verifier_type)


def prove(pk_path: str, inputs_json: str) -> str:
    """Returns proof.json for the given JSON input document."""
    return helper.prove(pk_path, flatten_json("main", inputs_json))


def verify(verifying_key_json: str, proof_with_inputs: str) -> bool:
    return helper.verify(verifying_key_json, proof_with_inputs)
