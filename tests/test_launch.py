"""Multi-host entry point (parallel/launch.py::init_distributed) exercised
for REAL across two OS processes on the CPU backend — the analog of the
reference's torchrun+NCCL launch that it tested with 8 procs
(fp_generate.py:233-239). Every other mesh test in this suite is
single-process virtual-device; this is the one that proves the
coordinator/process wiring: jax.distributed.initialize via our wrapper,
global device visibility, and a jitted XLA psum whose operands live in
DIFFERENT processes (gloo CPU collectives)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent("""
    import sys
    import jax
    # sitecustomize pre-imports jax pointed at the TPU relay; flip the
    # platform BEFORE any backend initializes (env vars are too late)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    pid = int(sys.argv[1])
    addr = sys.argv[2]

    from wanq_tpu.parallel.launch import init_distributed

    n = init_distributed(addr, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()
    assert n == 2, n

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("x",))
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("x")), np.asarray([float(pid + 1)]), (2,))
    f = jax.jit(shard_map(lambda v: jax.lax.psum(v, "x"), mesh=mesh,
                          in_specs=P("x"), out_specs=P()))
    total = float(np.asarray(f(garr))[0])
    assert total == 3.0, total
    print(f"LAUNCH_OK {pid} {n} {total}", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_init_distributed_two_processes(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # the pytest parent's conftest exports 8 virtual devices per process;
    # the workers must run 1 device each (2 global) or the topology is 16
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), addr],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {pid} timed out")
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    for pid, out in enumerate(outs):
        assert f"LAUNCH_OK {pid} 2 3.0" in out, out


def test_init_distributed_single_host_noop():
    # safe on a single host: no coordinator, returns local device count
    from wanq_tpu.parallel.launch import init_distributed

    import jax

    n = init_distributed()
    assert n == jax.device_count()
