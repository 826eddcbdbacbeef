"""Pallas ROIAlign kernel vs the XLA-gather reference (interpret mode on
CPU; compiled mode exercised on real TPU by the bench/verify drives)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import u2seg_tpu.ops.roi_align_pallas as rap
from u2seg_tpu.ops.roi_align import roi_align


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def test_pallas_matches_reference(rng):
    feat = jnp.array(rng.randn(2, 64, 64, 8).astype(np.float32))
    # boxes small enough to fit the WIN window at scale 1/4
    boxes = jnp.array([
        [8.0, 8.0, 120.0, 100.0],
        [0.0, 0.0, 60.0, 60.0],
        [100.0, 100.0, 200.0, 220.0],
    ], jnp.float32)
    bidx = jnp.array([0, 1, 0], jnp.int32)
    ref = roi_align(feat, boxes, bidx, 7, 0.25, 2)
    got = rap.roi_align_pallas(feat, boxes, bidx, 7, 0.25, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_degenerate_rois(rng):
    feat = jnp.array(rng.randn(1, 64, 64, 8).astype(np.float32))
    boxes = jnp.zeros((2, 4), jnp.float32)
    out = rap.roi_align_pallas(feat, boxes, jnp.zeros(2, jnp.int32), 7, 0.25, 2)
    assert np.isfinite(np.asarray(out)).all()
