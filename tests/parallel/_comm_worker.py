"""Worker for the real 2-process comm test (tests/parallel/test_comm.py).

Usage: python _comm_worker.py <coordinator_addr> <process_id> <num_processes>
"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    addr, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=nproc, process_id=pid
    )
    from u2seg_tpu.parallel import comm

    out = {"world": comm.get_world_size(), "rank": comm.get_rank(),
           "is_main": comm.is_main_process()}
    comm.synchronize()
    # variable-length payloads exercise the pad-to-max path
    payload = {"rank": comm.get_rank(), "blob": "x" * (7 + 400 * comm.get_rank())}
    out["all_gather"] = comm.all_gather(payload)
    out["gather"] = comm.gather(comm.get_rank(), dst=0)
    out["reduce_mean"] = comm.reduce_dict({"loss": float(comm.get_rank() + 1)})
    out["reduce_sum"] = comm.reduce_dict(
        {"n": float(comm.get_rank() + 1)}, average=False)
    out["seed"] = comm.shared_random_seed()
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
