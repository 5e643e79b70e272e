"""Multi-host wrapper: single-process no-op + global mesh construction."""
import jax

from instsearch_tpu.parallel import global_shard_mesh, initialize


def test_initialize_single_process_noop():
    initialize()   # must not raise or try to contact a coordinator
    assert jax.process_count() == 1


def test_global_shard_mesh_covers_all_devices():
    mesh = global_shard_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("shard",)


def test_two_process_distributed_search():
    """REAL multi-host: 2 processes x 4 virtual CPU devices, Gloo-backed
    collectives over loopback. Each process commits only its own row slice
    (build_multihost_index / shard_local_rows); search + subset-filtered
    search + QE + full_ranking + int8/int4 storage + regional rerank +
    diffusion + local-whitening + IVF-PQ run through the cross-process
    shard_map programs and must match the host oracle / single-device
    composite (asserted inside mh_worker.py)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:          # free loopback port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # the worker runs `python mh_worker.py`, whose sys.path[0] is the
    # SCRIPT dir, not this repo — an uninstalled checkout needs the repo
    # root on PYTHONPATH explicitly (a fresh venv has no editable install)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, worker, str(p), "2", str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for p in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MH_OK {i}" in out
