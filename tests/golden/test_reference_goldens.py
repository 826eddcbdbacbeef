"""Reference-parity golden tests.

Fixtures in ``fixtures/*.npz`` were produced by running the REFERENCE's own
pure-torch implementations (detectron2 matcher.py / box_regression.py /
sampling.py, executed from /root/reference by ``dev/make_goldens.py``) on
seeded cases. These tests pin this build's ops to those recorded outputs —
any semantic drift from the reference fails here without needing torch or
the reference tree at test time.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def load_cases(name):
    data = np.load(os.path.join(FIXTURES, name))
    n = int(data["n_cases"])
    keys = {k.split("_", 1)[1] for k in data.files if k != "n_cases"}
    return [
        {k: data[f"c{i}_{k}"] for k in keys if f"c{i}_{k}" in data.files}
        for i in range(n)
    ]


def test_matcher_matches_reference():
    from u2seg_tpu.models.matcher import match

    for i, c in enumerate(load_cases("matcher.npz")):
        q = jnp.asarray(c["quality"])
        gt_valid = jnp.ones((q.shape[0],), bool)
        idx, lab = match(
            q, gt_valid,
            thresholds=tuple(float(t) for t in c["thresholds"]),
            labels=tuple(int(l) for l in c["labels"]),
            allow_low_quality_matches=bool(c["allow_lq"]),
        )
        np.testing.assert_array_equal(
            np.asarray(lab, np.int64), c["match_labels"], err_msg=f"case {i}"
        )
        # matched_idx must agree wherever the prediction is not background
        # (ties in argmax may differ only between equal-quality gts; the
        # reference's argmax picks the same first-max as jnp.argmax)
        np.testing.assert_array_equal(
            np.asarray(idx, np.int64), c["match_idx"], err_msg=f"case {i}"
        )


def test_box_transform_matches_reference():
    from u2seg_tpu.structures.boxes import apply_deltas, get_deltas

    for i, c in enumerate(load_cases("box_transform.npz")):
        weights = tuple(float(w) for w in c["weights"])
        deltas = get_deltas(
            jnp.asarray(c["src"]), jnp.asarray(c["tgt"]), weights=weights
        )
        np.testing.assert_allclose(
            np.asarray(deltas), c["deltas"], rtol=1e-5, atol=1e-5,
            err_msg=f"case {i} get_deltas",
        )
        applied = apply_deltas(
            jnp.asarray(c["big_deltas"]), jnp.asarray(c["src"]), weights=weights
        )
        np.testing.assert_allclose(
            np.asarray(applied), c["applied"], rtol=1e-4, atol=1e-3,
            err_msg=f"case {i} apply_deltas",
        )


def test_subsample_labels_counts_match_reference():
    from u2seg_tpu.models.sampling import subsample_labels

    for i, c in enumerate(load_cases("subsample_labels.npz")):
        idx, valid, is_pos = subsample_labels(
            jax.random.PRNGKey(i),
            jnp.asarray(c["labels"], jnp.int32),
            int(c["num_samples"]),
            float(c["pos_frac"]),
        )
        got_pos = int(jnp.sum(valid & is_pos))
        got_neg = int(jnp.sum(valid & ~is_pos))
        assert got_pos == int(c["num_pos"]), f"case {i}: pos {got_pos}"
        assert got_neg == int(c["num_neg"]), f"case {i}: neg {got_neg}"
        # sampled indices must point at the right label kind
        lab = c["labels"][np.asarray(idx)]
        pos_sel = np.asarray(valid & is_pos)
        neg_sel = np.asarray(valid & ~is_pos)
        assert (lab[pos_sel] == 1).all()
        assert (lab[neg_sel] == 0).all()


# ---------------------------------------------------------------------------
# ROIAlign: the reference's hand-verified 5x5 case (tests/layers/
# test_roi_align.py:14-47 values) + a torch grid_sample oracle
# ---------------------------------------------------------------------------

def test_roi_align_reference_values():
    from u2seg_tpu.ops.roi_align import roi_align

    img = jnp.arange(25, dtype=jnp.float32).reshape(1, 5, 5, 1)
    boxes = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    out = roi_align(img, boxes, jnp.zeros((1,), jnp.int32), 4, 1.0,
                    sampling_ratio=0, aligned=True)
    want = np.array([
        [4.5, 5.0, 5.5, 6.0],
        [7.0, 7.5, 8.0, 8.5],
        [9.5, 10.0, 10.5, 11.0],
        [12.0, 12.5, 13.0, 13.5],
    ])
    np.testing.assert_allclose(np.asarray(out[0, :, :, 0]), want, atol=1e-5)

    out = roi_align(img, boxes, jnp.zeros((1,), jnp.int32), 4, 1.0,
                    sampling_ratio=0, aligned=False)
    want_unaligned = np.array([
        [7.5, 8, 8.5, 9],
        [10, 10.5, 11, 11.5],
        [12.5, 13, 13.5, 14],
        [15, 15.5, 16, 16.5],
    ])
    np.testing.assert_allclose(
        np.asarray(out[0, :, :, 0]), want_unaligned, atol=1e-5
    )


def _torch_grid_sample_roi_align(img_np, box, out_size, sampling_ratio):
    """Independent oracle: ROIAlign(aligned=True) as torch grid_sample with
    align_corners=False — the published equivalence the reference's
    test_grid_sample_equivalence checks (tests/layers/test_roi_align.py:64)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x0, y0, x1, y1 = box
    H, W = img_np.shape
    ph = pw = out_size
    r = sampling_ratio
    # sample points: per output cell, an r x r grid of bilinear samples
    bin_h = (y1 - y0) / ph
    bin_w = (x1 - x0) / pw
    ys, xs = [], []
    for iy in range(ph * r):
        ys.append(y0 + (iy + 0.5) * bin_h / r)
    for ix in range(pw * r):
        xs.append(x0 + (ix + 0.5) * bin_w / r)
    gy = torch.tensor(ys, dtype=torch.float64)
    gx = torch.tensor(xs, dtype=torch.float64)
    # normalize to [-1, 1] in align_corners=False convention
    ny = gy * 2 / H - 1
    nx = gx * 2 / W - 1
    grid = torch.stack(
        [nx[None, :].expand(ph * r, pw * r),
         ny[:, None].expand(ph * r, pw * r)], dim=-1
    )[None].to(torch.float64)
    inp = torch.from_numpy(img_np).double()[None, None]
    samples = F.grid_sample(inp, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)
    out = samples.reshape(1, 1, ph, r, pw, r).mean(dim=(3, 5))
    return out[0, 0].numpy()


def test_roi_align_grid_sample_oracle():
    from u2seg_tpu.ops.roi_align import roi_align

    rng = np.random.RandomState(4)
    img = (rng.rand(30, 30) * 100).astype(np.float32)
    for box, ratio in [((10, 10, 20, 20), 1), ((10, 10, 20, 20), 2),
                       ((3.5, 6.25, 22.0, 27.5), 3), ((0, 0, 30, 30), 2)]:
        want = _torch_grid_sample_roi_align(img, box, 5, ratio)
        got = roi_align(
            jnp.asarray(img)[None, :, :, None],
            jnp.asarray([box], jnp.float32),
            jnp.zeros((1,), jnp.int32), 5, 1.0,
            sampling_ratio=ratio, aligned=True,
        )[0, :, :, 0]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-3, err_msg=f"{box} r={ratio}")
