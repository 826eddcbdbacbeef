"""comm helpers degrade gracefully at world_size 1 (the reference's tests
rely on the same property; multi-process paths are exercised on pods)."""
from u2seg_tpu.parallel import comm


def test_single_process_semantics():
    assert comm.get_world_size() == 1
    assert comm.get_rank() == 0
    assert comm.is_main_process()
    comm.synchronize()  # no-op
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    assert comm.gather([1, 2]) == [[1, 2]]
    d = comm.reduce_dict({"x": 2.0, "y": 3.0})
    assert d == {"x": 2.0, "y": 3.0}
    s = comm.shared_random_seed()
    assert isinstance(s, int)


import json
import os
import socket
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_comm():
    """Real 2-process jax.distributed run over localhost (CPU platform):
    all_gather / gather / reduce_dict / shared_random_seed beyond
    world_size 1 (ref analog: dev/run_*_tests.sh --num-gpus 2,
    detectron2/utils/comm.py:138)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_comm_worker.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never claim the TPU tunnel
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.dirname(worker)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, addr, str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env,
        )
        for i in range(2)
    ]
    results = {}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"worker {i} failed:\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results[i] = json.loads(line[len("RESULT "):])

    for i in (0, 1):
        r = results[i]
        assert r["world"] == 2 and r["rank"] == i
        assert r["is_main"] == (i == 0)
        # all_gather returns both payloads, rank-ordered, on every process
        assert [g["rank"] for g in r["all_gather"]] == [0, 1]
        assert len(r["all_gather"][1]["blob"]) == 407
        assert r["reduce_mean"] == {"loss": 1.5}
        assert r["reduce_sum"] == {"n": 3.0}
    # gather: only dst rank receives, others get []
    assert results[0]["gather"] == [0, 1]
    assert results[1]["gather"] == []
    # shared seed agrees across processes
    assert results[0]["seed"] == results[1]["seed"]
