"""The VPU two-tap 2x upsample must equal jax.image.resize bilinear exactly
(the sem-seg scale heads use it on the inference hot path)."""
import jax
import jax.numpy as jnp
import numpy as np

from u2seg_tpu.models.sem_seg import (_resize_bilinear, _upsample2x_bilinear,
                                      upsample_bilinear)


def test_upsample2x_matches_image_resize():
    rng = np.random.RandomState(0)
    for shape in [(2, 7, 9, 5), (1, 25, 42, 16), (3, 1, 4, 2), (1, 2, 2, 1)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        want = _resize_bilinear(x, shape[1] * 2, shape[2] * 2)
        got = _upsample2x_bilinear(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=str(shape))


def test_upsample2x_bf16_runs():
    x = jnp.ones((1, 4, 4, 8), jnp.bfloat16)
    out = _upsample2x_bilinear(x)
    assert out.shape == (1, 8, 8, 8) and out.dtype == jnp.bfloat16


def test_upsample_nx_matches_image_resize():
    rng = np.random.RandomState(1)
    for s_ in (2, 3, 4):
        x = jnp.asarray(rng.randn(2, 6, 7, 3).astype(np.float32))
        want = _resize_bilinear(x, 6 * s_, 7 * s_)
        got = upsample_bilinear(x, s_)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=f"s={s_}")
