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
