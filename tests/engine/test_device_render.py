"""Device render (engine/device_render.py) vs the exact host oracle
(engine/panoptic_render.py).

The device path must reproduce the host render bit-for-bit on
well-conditioned inputs (no argmax/threshold ties): same semantic argmax
map, same panoptic id map (sequential ids), same segments_info.
"""
import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from u2seg_tpu.engine import device_render as dr  # noqa: E402
from u2seg_tpu.engine import panoptic_render as pr  # noqa: E402


def _fetch(r: dr.RenderedImage) -> dict:
    return {
        f.name: np.asarray(getattr(r, f.name))
        for f in dataclasses.fields(r)
    }


class TestRLE:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        flat = np.repeat(rng.randint(0, 7, 40), rng.randint(1, 9, 40))
        s, v, n = dr.rle_encode(jnp.asarray(flat), max_runs=128)
        assert int(n) <= 128
        dec = dr.rle_decode(np.asarray(s), np.asarray(v), int(n), len(flat))
        np.testing.assert_array_equal(dec, flat)

    def test_single_run(self):
        flat = np.zeros(100, np.int32)
        s, v, n = dr.rle_encode(jnp.asarray(flat), max_runs=8)
        assert int(n) == 1
        dec = dr.rle_decode(np.asarray(s), np.asarray(v), int(n), 100)
        np.testing.assert_array_equal(dec, flat)

    def test_overflow_detected(self):
        flat = np.arange(50, dtype=np.int32)  # 50 runs
        _, _, n = dr.rle_encode(jnp.asarray(flat), max_runs=16)
        assert int(n) == 50  # caller compares n > max_runs -> fallback

    def test_vmappable(self):
        rng = np.random.RandomState(1)
        flat = rng.randint(0, 3, (4, 64)).astype(np.int32)
        s, v, n = jax.vmap(lambda f: dr.rle_encode(f, 64))(jnp.asarray(flat))
        for b in range(4):
            dec = dr.rle_decode(
                np.asarray(s[b]), np.asarray(v[b]), int(n[b]), 64
            )
            np.testing.assert_array_equal(dec, flat[b])


class TestSemChain:
    @pytest.mark.parametrize("ih,iw,oh,ow", [
        (30, 40, 22, 31),    # downscale
        (16, 20, 40, 52),    # upscale
        (32, 40, 32, 40),    # identity second stage
    ])
    def test_composed_weights_match_host_chain(self, ih, iw, oh, ow):
        rng = np.random.RandomState(2)
        h4, w4, c = 8, 10, 5
        logits = rng.randn(h4, w4, c).astype(np.float32)
        ref = pr.sem_seg_probs_full_res(logits, (ih, iw), (oh, ow))

        oh_c, ow_c = 48, 56
        wy = dr.sem_resize_weights(oh_c, h4, 4, jnp.int32(ih), jnp.int32(oh))
        wx = dr.sem_resize_weights(ow_c, w4, 4, jnp.int32(iw), jnp.int32(ow))
        full = np.asarray(jnp.einsum(
            "ip,pqc,jq->ijc", wy, jnp.asarray(logits), wx,
            precision=jax.lax.Precision.HIGHEST,
        ))[:oh, :ow]
        np.testing.assert_allclose(full, ref, rtol=1e-5, atol=1e-5)


def _make_case(seed=0, k=12, m=14, h4=12, w4=16, c=6,
               ih=44, iw=60, oh=36, ow=50):
    """Well-separated synthetic detections + sem logits (no ties)."""
    rng = np.random.RandomState(seed)
    boxes = np.zeros((k, 4), np.float32)
    xy = rng.rand(k, 2) * [iw * 0.6, ih * 0.6]
    wh = rng.rand(k, 2) * [iw * 0.35, ih * 0.35] + 6
    boxes[:, :2] = xy
    boxes[:, 2:] = xy + wh
    scores = np.sort(rng.rand(k).astype(np.float32))[::-1] * 0.6 + 0.35
    scores[k // 2:] = rng.rand(k - k // 2) * 0.3  # below conf thresh
    classes = rng.randint(0, 9, k).astype(np.int32)
    valid = np.ones(k, bool)
    valid[-1] = False
    mask_logits = rng.randn(k, m, m).astype(np.float32) * 4  # away from 0
    sem_logits = rng.randn(h4, w4, c).astype(np.float32) * 3
    return (boxes, scores, classes, valid, mask_logits, sem_logits,
            (ih, iw), (oh, ow))


class TestFullRender:
    CANVAS = (40, 56)
    # random sem logits make a near-worst-case argmax map: budget must
    # cover up to one run per pixel of the 40x56 canvas
    KW = dict(k_fuse=10, max_runs=4096,
              instance_conf_thresh=0.5, overlap_thresh=0.5,
              stuff_area_limit=40)

    def _run_device(self, case):
        (boxes, scores, classes, valid, mask_logits, sem_logits,
         ihw, ohw) = case
        r = jax.jit(
            lambda *a: dr.render_image(*a, canvas=self.CANVAS, **self.KW)
        )(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            jnp.asarray(valid), jnp.asarray(mask_logits),
            jnp.asarray(sem_logits),
            jnp.asarray(ihw, jnp.int32), jnp.asarray(ohw, jnp.int32),
        )
        fetched = _fetch(r)
        fetched["det_valid"] = valid
        return fetched

    def _run_host(self, case):
        (boxes, scores, classes, valid, mask_logits, sem_logits,
         ihw, ohw) = case
        return pr.render_panoptic_output(
            boxes, scores, classes, valid, mask_logits, sem_logits,
            ihw, ohw,
            instance_conf_thresh=self.KW["instance_conf_thresh"],
            overlap_thresh=self.KW["overlap_thresh"],
            stuff_area_limit=self.KW["stuff_area_limit"],
        )

    @pytest.mark.parametrize("seed", [0, 3, 7, 11])
    def test_matches_host_oracle(self, seed):
        case = _make_case(seed=seed)
        fetched = self._run_device(case)
        assert not bool(fetched["fallback"])
        sem_d, pan_d, segs_d = dr.decode_rendered_image(
            fetched, self.CANVAS, case[-1]
        )
        sem_h, pan_h, segs_h = self._run_host(case)

        mismatch = np.mean(sem_d != sem_h)
        assert mismatch == 0.0, f"sem argmax mismatch {mismatch:.2%}"
        np.testing.assert_array_equal(pan_d, pan_h)
        assert len(segs_d) == len(segs_h)
        for a, b in zip(segs_d, segs_h):
            assert a["id"] == b["id"] and a["isthing"] == b["isthing"]
            assert a["category_id"] == b["category_id"]
            if a["isthing"]:
                assert a["instance_id"] == b["instance_id"]
                np.testing.assert_allclose(a["score"], b["score"], rtol=1e-6)
            else:
                assert a["area"] == b["area"]

    def test_no_detections(self):
        case = _make_case(seed=5)
        boxes, scores, classes, valid, ml, sl, ihw, ohw = case
        case = (boxes, scores * 0.0, classes, valid, ml, sl, ihw, ohw)
        fetched = self._run_device(case)
        sem_d, pan_d, segs_d = dr.decode_rendered_image(
            fetched, self.CANVAS, ohw
        )
        sem_h, pan_h, segs_h = self._run_host(case)
        np.testing.assert_array_equal(pan_d, pan_h)
        np.testing.assert_array_equal(sem_d, sem_h)
        assert all(not s["isthing"] for s in segs_d)
        assert len(segs_d) == len(segs_h)

    def test_fallback_flags(self):
        case = _make_case()
        # original size exceeding the canvas -> fallback
        big = case[:-1] + ((self.CANVAS[0] + 8, self.CANVAS[1]),)
        fetched = self._run_device(big)
        assert bool(fetched["fallback"])

        # eligible instances exceeding the fusion budget -> fallback
        boxes, scores, classes, valid, ml, sl, ihw, ohw = case
        many = (boxes, np.full_like(scores, 0.9), classes,
                np.ones_like(valid), ml, sl, ihw, ohw)
        fetched = self._run_device(many)
        assert bool(fetched["fallback"])


class TestDeviceResize:
    @pytest.mark.parametrize("oh,ow,ih,iw", [
        (30, 44, 46, 67),    # upscale (the test-time norm: short edge up)
        (50, 40, 25, 20),    # downscale
        (32, 32, 32, 32),    # identity
    ])
    def test_matches_f32_cv2_oracle(self, oh, ow, ih, iw):
        import cv2

        rng = np.random.RandomState(0)
        img = (rng.rand(oh, ow, 3) * 255).astype(np.uint8)
        ref = cv2.resize(img.astype(np.float32), (iw, ih),
                         interpolation=cv2.INTER_LINEAR)

        rh, rw, bh, bw = 64, 64, 72, 80
        raw = np.zeros((rh, rw, 3), np.uint8)
        raw[:oh, :ow] = img
        out = np.asarray(jax.jit(
            lambda r, o, s: dr.resize_image_device(r, o, s, (bh, bw))
        )(jnp.asarray(raw), jnp.asarray([oh, ow], jnp.int32),
          jnp.asarray([ih, iw], jnp.int32)))
        np.testing.assert_allclose(out[:ih, :iw], ref, rtol=1e-4, atol=1e-3)
        # padding region zeroed
        assert np.all(out[ih:] == 0) and np.all(out[:, iw:] == 0)


class TestPackedRender:
    def test_pack_roundtrip(self):
        """pack_rendered_batch + host prefix decode == per-image decode."""
        rng = np.random.RandomState(7)
        bsz, max_runs, n = 3, 64, 200
        flats = [
            np.pad(np.repeat(rng.randint(0, 5, 40), rng.randint(1, 11, 40)),
                   (0, n), mode="edge")[:n]
            for _ in range(2 * bsz)
        ]
        enc = [dr.rle_encode(jnp.asarray(f), max_runs) for f in flats]
        kf, c = 4, 5
        r = dr.RenderedImage(
            pan_starts=jnp.stack([enc[2 * b][0] for b in range(bsz)]),
            pan_values=jnp.stack([enc[2 * b][1] for b in range(bsz)]),
            pan_nruns=jnp.stack([enc[2 * b][2] for b in range(bsz)]),
            sem_starts=jnp.stack([enc[2 * b + 1][0] for b in range(bsz)]),
            sem_values=jnp.stack([enc[2 * b + 1][1] for b in range(bsz)]),
            sem_nruns=jnp.stack([enc[2 * b + 1][2] for b in range(bsz)]),
            takes=jnp.zeros((bsz, kf), bool),
            order=jnp.zeros((bsz, kf), jnp.int32),
            sorted_scores=jnp.zeros((bsz, kf)),
            sorted_classes=jnp.zeros((bsz, kf), jnp.int32),
            stuff_ok=jnp.zeros((bsz, c), bool),
            stuff_area=jnp.zeros((bsz, c), jnp.int32),
            fallback=jnp.zeros((bsz,), bool),
        )
        packed = jax.jit(dr.pack_rendered_batch)(r)
        offs = np.asarray(packed.offs, np.int64)
        starts = np.asarray(packed.starts)
        values = np.asarray(packed.values)
        assert int(offs[-1]) == sum(int(e[2]) for e in enc)
        for b in range(bsz):
            p0, p1, p2 = offs[2 * b], offs[2 * b + 1], offs[2 * b + 2]
            pan = dr.rle_decode(starts[p0:p1], values[p0:p1], p1 - p0, n)
            sem = dr.rle_decode(starts[p1:p2], values[p1:p2], p2 - p1, n)
            np.testing.assert_array_equal(pan, flats[2 * b])
            np.testing.assert_array_equal(sem, flats[2 * b + 1])


def test_fetch_buffer_round_trip():
    """pack_fetch_buffer (device, bitcast+concat) -> unpack_fetch_buffer
    (host, frombuffer views) must reproduce every field exactly."""
    rng = np.random.RandomState(7)
    bsz, k_det, kf, c, prefix = 2, 6, 4, 5, 32
    r = dr.PackedRender(
        starts=jnp.zeros((2 * bsz * 16,), jnp.int32),
        values=jnp.zeros((2 * bsz * 16,), jnp.int16),
        offs=jnp.asarray(rng.randint(0, 100, 2 * bsz + 1), jnp.int32),
        starts_prefix=jnp.asarray(rng.randint(0, 1 << 20, prefix), jnp.int32),
        values_prefix=jnp.asarray(rng.randint(-300, 300, prefix), jnp.int16),
        takes=jnp.asarray(rng.rand(bsz, kf) > 0.5),
        order=jnp.asarray(rng.randint(0, kf, (bsz, kf)), jnp.int32),
        sorted_scores=jnp.asarray(rng.randn(bsz, kf).astype(np.float32)),
        sorted_classes=jnp.asarray(rng.randint(0, 9, (bsz, kf)), jnp.int32),
        stuff_ok=jnp.asarray(rng.rand(bsz, c) > 0.5),
        stuff_area=jnp.asarray(rng.randint(0, 10000, (bsz, c)), jnp.int32),
        fallback=jnp.asarray([False, True]),
    )
    det = {
        "boxes": jnp.asarray(rng.rand(bsz, k_det, 4).astype(np.float32) * 640),
        "scores": jnp.asarray(rng.rand(bsz, k_det).astype(np.float32)),
        "classes": jnp.asarray(rng.randint(0, 800, (bsz, k_det)), jnp.int32),
        "valid": jnp.asarray(rng.rand(bsz, k_det) > 0.3),
    }
    buf = jax.jit(dr.pack_fetch_buffer)(r, det)
    assert buf.dtype == jnp.uint8 and buf.ndim == 1
    layout = dr.fetch_layout(bsz, k_det, kf, c, prefix)
    out = dr.unpack_fetch_buffer(np.asarray(buf), layout)
    np.testing.assert_array_equal(out["offs"], np.asarray(r.offs))
    np.testing.assert_array_equal(out["starts"], np.asarray(r.starts_prefix))
    np.testing.assert_array_equal(out["values"], np.asarray(r.values_prefix))
    np.testing.assert_array_equal(out["takes"].astype(bool),
                                  np.asarray(r.takes))
    np.testing.assert_array_equal(out["order"], np.asarray(r.order))
    np.testing.assert_array_equal(out["sorted_scores"],
                                  np.asarray(r.sorted_scores))
    np.testing.assert_array_equal(out["sorted_classes"],
                                  np.asarray(r.sorted_classes))
    np.testing.assert_array_equal(out["stuff_ok"].astype(bool),
                                  np.asarray(r.stuff_ok))
    np.testing.assert_array_equal(out["stuff_area"], np.asarray(r.stuff_area))
    np.testing.assert_array_equal(out["fallback"].astype(bool),
                                  np.asarray(r.fallback))
    np.testing.assert_array_equal(out["det_boxes"], np.asarray(det["boxes"]))
    np.testing.assert_array_equal(out["det_scores"], np.asarray(det["scores"]))
    np.testing.assert_array_equal(out["det_classes"],
                                  np.asarray(det["classes"]))
    np.testing.assert_array_equal(out["det_valid"].astype(bool),
                                  np.asarray(det["valid"]))
