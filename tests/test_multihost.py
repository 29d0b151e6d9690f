"""Multi-host (2-process) wiring test over the CPU backend.

Spawns 2 worker processes, each owning 4 virtual CPU devices; the
workers connect via jax.distributed (the DCN analogue), build an
8-device global mesh, and run the sharded RNS four-step NTT with
inputs constructed as global arrays -- collectives cross the process
boundary. Worker 0 checks the transform against the host golden
Domain and prints MULTIHOST_OK.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["ZA_REPO"])
import numpy as np

import jax
# the tunneled TPU plugin ignores JAX_PLATFORMS env; force via config
# BEFORE the first backend touch
jax.config.update("jax_platforms", "cpu")

from za_tpu.engine.dist import init_distributed, host_to_global
assert init_distributed(), "distributed init did not engage"

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

import za_tpu.engine.mesh as MESH
import za_tpu.engine.rns as RNS
from za_tpu.engine.rns import RR
from za_tpu.curve import R
from za_tpu.groth16.domain import Domain

mesh = MESH.make_mesh(8)
n = 64
dd = MESH.ShardedRnsDomain(n, 8)
fwd = MESH.sharded_ntt_rns_fn(mesh, dd, inverse=False)

rng = np.random.default_rng(7)
coeffs = [int(v) for v in rng.integers(0, 1 << 62, size=n)]
cm = RR.ints_to_rns([c * RR.m1 % R for c in coeffs])
x = host_to_global(mesh, cm.astype(np.uint32), P(None, "d"))

out = fwd(x)
from jax.experimental import multihost_utils
out_np = np.asarray(multihost_utils.process_allgather(out, tiled=True))
if jax.process_index() == 0:
    got = [RR.from_mont_int(v) % R for v in RR.rns_to_ints(out_np)]
    want = Domain(n).ntt(coeffs)
    assert got == want, "sharded multi-process NTT mismatch"
    print("MULTIHOST_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_ntt(tmp_path):
    port = _free_port()
    workers = []
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            ZA_REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ZA_DIST=f"localhost:{port},2,{pid}",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        env.pop("JAX_COORDINATOR_ADDRESS", None)
        workers.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for w in workers:
        try:
            out, _ = w.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for ww in workers:
                ww.kill()
            raise
        outs.append(out)
    for i, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {i} failed:\n{out}"
    assert "MULTIHOST_OK" in outs[0], outs[0]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
