"""Multi-host entry point: a real 2-process jax.distributed CPU cluster
(Gloo collectives), exercising `make_mesh(distributed=True)` and a
process-spanning global reduction. TPU pods use the same entry point with
no explicit coordinator args (the runtime supplies topology)."""
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow  # heavy integration lane

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bild_tpu.parallel import make_mesh

    mesh = make_mesh(axis_names=("data",), distributed=True,
                     coordinator_address=f"localhost:{{port}}",
                     num_processes=2, process_id=pid)
    assert len(jax.devices()) == 4, jax.devices()
    assert mesh.shape["data"] == 4

    # per-process local shard -> global array -> global reduction over DCN
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.full((2,), pid + 1.0))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    assert float(total) == 6.0, float(total)
    print(f"OK {{pid}}", flush=True)
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster(tmp_path):
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=repo))
    port = _free_port()

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen([sys.executable, str(worker), str(port), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=str(tmp_path))
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK {i}" in out
