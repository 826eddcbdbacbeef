"""DefaultPredictor.run_batched must reproduce the per-image __call__
outputs exactly — batching, tail padding, multi-bucket grouping, and the
one-in-flight pipeline are pure reorganizations of the same computation."""
import dataclasses

import numpy as np
import pytest

from u2seg_tpu.config.testing import tiny_spmd_config


def _predictor():
    from u2seg_tpu.engine.predictor import DefaultPredictor

    cfg = tiny_spmd_config()
    cfg = dataclasses.replace(
        cfg,
        input=dataclasses.replace(
            cfg.input,
            min_size_test=64, max_size_test=128,
            pad_buckets=((64, 128), (128, 64)),
        ),
        test=dataclasses.replace(
            cfg.test,
            # canvas covers the 40x80 / 80x40 originals; the random-weight
            # argmax map is near-worst-case, so budget ~1 run/px
            render_canvas=(80, 80), render_max_runs=8192,
            raw_buckets=((80, 80),),
        ),
    )
    return DefaultPredictor(cfg)


def _images(n=5, seed=0):
    rs = np.random.RandomState(seed)
    imgs = []
    for i in range(n):
        # alternate wide/tall so both buckets are exercised
        h, w = (40, 80) if i % 2 == 0 else (80, 40)
        imgs.append((rs.rand(h, w, 3) * 255).astype(np.uint8))
    return imgs


def _assert_same(a: dict, b: dict):
    # Batch-1 and batch-N executables fuse/reduce in different orders, so
    # continuous outputs carry ~1e-4 float noise; an indexing bug in the
    # batched path would instead produce wholesale mismatches.
    np.testing.assert_allclose(
        a["instances"]["boxes"], b["instances"]["boxes"], atol=0.05)
    np.testing.assert_allclose(
        a["instances"]["scores"], b["instances"]["scores"], atol=1e-3)
    np.testing.assert_array_equal(
        a["instances"]["classes"], b["instances"]["classes"])
    if "masks" in a["instances"]:
        for ma, mb in zip(a["instances"]["masks"], b["instances"]["masks"]):
            assert (ma != mb).mean() < 0.01
    # discrete maps: allow boundary pixels to flip under the float noise
    assert (a["sem_seg"] != b["sem_seg"]).mean() < 0.01
    assert (a["panoptic"] != b["panoptic"]).mean() < 0.01
    assert [s["category_id"] for s in a["segments"]] == [
        s["category_id"] for s in b["segments"]]


@pytest.mark.slow
def test_run_batched_matches_single_image():
    pred = _predictor()
    imgs = _images(5)
    sequential = {i: pred(img) for i, img in enumerate(imgs)}
    # batch 2 over 5 images in 2 buckets: exercises grouping, a padded tail
    # group per bucket, and the pipelined drain
    got = dict(pred.run_batched(enumerate(imgs), batch_size=2))
    assert sorted(got) == sorted(sequential)
    for i in sequential:
        _assert_same(got[i], sequential[i])


@pytest.mark.slow
def test_run_batched_device_render_matches_host_render():
    """The on-device full-res render path (engine/device_render.py) must
    reproduce the host-render path per image (same pipeline, the render
    moved on device + RLE fetch)."""
    pred = _predictor()
    imgs = _images(5, seed=1)
    host = dict(pred.run_batched(enumerate(imgs), batch_size=2))
    dev = dict(pred.run_batched(enumerate(imgs), batch_size=2,
                                device_render=True))
    assert sorted(dev) == sorted(host)
    for i in host:
        _assert_same(dev[i], host[i])
        # device-render mode skips the per-instance host mask paste
        assert "masks" not in dev[i]["instances"]
        # segment structure must match exactly (ids, kinds, instance refs)
        for a, b in zip(dev[i]["segments"], host[i]["segments"]):
            assert a["id"] == b["id"] and a["isthing"] == b["isthing"]


@pytest.mark.slow
def test_run_batched_single_group_padding():
    pred = _predictor()
    imgs = _images(1, seed=3)
    (meta, res), = list(pred.run_batched([("only", imgs[0])], batch_size=4))
    assert meta == "only"
    _assert_same(res, pred(imgs[0]))


@pytest.mark.slow
def test_run_batched_device_resize_matches_host_resize():
    """Raw-u8 upload + on-device resize must reproduce the host-resize
    device-render path (both implement the same float bilinear; diffs are
    f32 rounding only)."""
    pred = _predictor()
    imgs = _images(4, seed=2)
    host = dict(pred.run_batched(enumerate(imgs), batch_size=2,
                                 device_render=True))
    dev = dict(pred.run_batched(enumerate(imgs), batch_size=2,
                                device_render=True, device_resize=True))
    assert sorted(dev) == sorted(host)
    for i in host:
        _assert_same(dev[i], host[i])
