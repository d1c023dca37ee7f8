"""Multi-host path: 2 local jax.distributed CPU processes.

Validates init_distributed, the global mesh spanning both processes,
per-host disjoint data sharding, global-mean metric reduction, collective
orbax save/restore with the manager on every process, and is_main_process
gating (VERDICT r1 items #6c/#9).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    num_procs = 2
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [subprocess.Popen(
        [sys.executable, str(REPO / "tests" / "_multihost_worker.py"),
         coordinator, str(num_procs), str(pid), str(tmp_path)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(num_procs)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = [json.loads((tmp_path / f"result_{pid}.json").read_text())
               for pid in range(num_procs)]
    assert [r["is_main"] for r in results] == [True, False]
    assert all(r["devices"] == 4 and r["local_devices"] == 2
               for r in results)
    # both processes computed the same GLOBAL mean
    assert abs(results[0]["gmean"] - results[1]["gmean"]) < 1e-6
    # per-host data shards are disjoint (different sample sums)
    s0, s1 = (set(np.round(r["local_sums"], 3)) for r in results)
    assert not (s0 & s1), (s0, s1)
