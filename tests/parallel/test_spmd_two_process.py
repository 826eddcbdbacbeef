"""Real 2-process SPMD train step over jax.distributed (CPU platform).

``make_train_step`` (shard_map + psum over the data axis) compiled and run
across 2 processes x 4 forced host devices = the same 8-device global mesh
the driver dryrun uses single-process (__graft_entry__.dryrun_multichip);
the metrics of the two runs must agree. Reference analog: the NCCL
2-process runs of dev/run_{instant,inference}_tests.sh (--num-gpus 2)
exercising DDP gradient all-reduce (detectron2/engine/launch.py:27).
"""
import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_spmd_worker.py")
NDEV = 8


def _run(nproc: int, timeout: int):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never claim the TPU tunnel
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.dirname(WORKER)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={NDEV // nproc}"])
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, addr, str(i), str(nproc), str(NDEV)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    results = {}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker {i} failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results[i] = json.loads(line[len("RESULT "):])
    return results


@pytest.mark.slow
@pytest.mark.xslow
def test_two_process_spmd_step_matches_single_process():
    single = _run(1, timeout=1800)[0]
    two = _run(2, timeout=1800)
    assert two[0] == two[1], "replicated outputs differ across processes"
    assert single["_step"] == two[0]["_step"] == 1
    assert set(single) == set(two[0])
    for k in single:
        if k.startswith("_"):
            continue
        # same global computation; only the cross-process all-reduce's
        # summation grouping may differ from the single-process one
        assert two[0][k] == pytest.approx(single[k], rel=3e-5), k
