"""Single-process smoke of the multi-host init path (parallel/distributed):
jax.distributed.initialize must come up with an explicit 1-process
topology and leave the mesh machinery functional. Runs in a subprocess
because the distributed runtime is process-global state.
"""
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from gramtools_tpu.parallel.distributed import init_distributed, is_coordinator
init_distributed(coordinator_address="localhost:{port}", num_processes=1,
                 process_id=0)
assert jax.process_count() == 1, jax.process_count()
assert is_coordinator()
from gramtools_tpu.parallel.mesh import make_mesh
mesh = make_mesh()
assert mesh.devices.size == 4, mesh.devices.size
print("DISTRIBUTED-OK")
"""


def test_init_distributed_single_process():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(port=port)],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "DISTRIBUTED-OK" in out.stdout
