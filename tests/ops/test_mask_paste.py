import numpy as np
import jax.numpy as jnp

from u2seg_tpu.ops.mask_paste import paste_masks


def paste_ref(mask, box, out_h, out_w):
    """Reference: per-pixel bilinear sample with zero padding (grid_sample
    align_corners=False semantics, as in detectron2 _do_paste_mask)."""
    m = mask.shape[0]
    out = np.zeros((out_h, out_w))
    x0, y0, x1, y1 = box
    for y in range(out_h):
        for x in range(out_w):
            my = (y + 0.5 - y0) / max(y1 - y0, 1e-4) * m - 0.5
            mx = (x + 0.5 - x0) / max(x1 - x0, 1e-4) * m - 0.5
            v = 0.0
            fy, fx = int(np.floor(my)), int(np.floor(mx))
            for dy in (0, 1):
                for dx in (0, 1):
                    yy, xx = fy + dy, fx + dx
                    if 0 <= yy < m and 0 <= xx < m:
                        wy = 1 - abs(my - yy)
                        wx = 1 - abs(mx - xx)
                        if wy > 0 and wx > 0:
                            v += mask[yy, xx] * wy * wx
            out[y, x] = v
    return out


def test_paste_matches_reference(rng):
    mask = rng.rand(14, 14).astype(np.float32)
    box = np.array([3.0, 5.0, 25.0, 20.0], dtype=np.float32)
    got = np.asarray(paste_masks(jnp.array(mask[None]), jnp.array(box[None]), 28, 32))[0]
    ref = paste_ref(mask, box, 28, 32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_paste_zero_outside_box(rng):
    mask = np.ones((8, 8), np.float32)
    box = np.array([10.0, 10.0, 20.0, 20.0], np.float32)
    out = np.asarray(paste_masks(jnp.array(mask[None]), jnp.array(box[None]), 32, 32))[0]
    assert out[:9, :].max() == 0.0
    assert out[15, 15] > 0.9
    assert out[22:, :].max() == 0.0
