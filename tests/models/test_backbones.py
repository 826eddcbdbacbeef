import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles (see pytest.ini / dev/run_tests.sh)

from u2seg_tpu.models.swin import SwinTransformer
from u2seg_tpu.models.vit import ViT, ViTDet


def test_vit_backbone_shapes(rng):
    m = ViT(dim=96, depth=4, num_heads=4, window_size=4, global_blocks=(1, 3))
    x = jnp.array(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out["last_feat"].shape == (1, 4, 4, 96)


def test_vitdet_pyramid_shapes(rng):
    m = ViTDet(
        vit=ViT(dim=96, depth=2, num_heads=4, window_size=4, global_blocks=(1,)),
        out_channels=64,
    )
    x = jnp.array(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out["p2"].shape == (1, 16, 16, 64)
    assert out["p3"].shape == (1, 8, 8, 64)
    assert out["p4"].shape == (1, 4, 4, 64)
    assert out["p5"].shape == (1, 2, 2, 64)
    assert out["p6"].shape == (1, 1, 1, 64)


def test_swin_backbone_shapes(rng):
    m = SwinTransformer(embed_dim=48, depths=(1, 1, 2, 1),
                        num_heads=(2, 2, 4, 4), window_size=4)
    x = jnp.array(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out["res2"].shape == (1, 16, 16, 48)
    assert out["res3"].shape == (1, 8, 8, 96)
    assert out["res4"].shape == (1, 4, 4, 192)
    assert out["res5"].shape == (1, 2, 2, 384)
    for k, feat in out.items():
        assert np.isfinite(np.asarray(feat)).all(), k


def test_swin_shifted_windows_differ_from_unshifted(rng):
    """The shift must change the computation (mask + roll active)."""
    x = jnp.array(rng.rand(1, 16, 16, 3).astype(np.float32))
    m1 = SwinTransformer(embed_dim=24, depths=(2,), num_heads=(2,), window_size=4)
    v = m1.init({"params": jax.random.PRNGKey(0)}, x)
    out = m1.apply(v, x)["res2"]
    assert np.isfinite(np.asarray(out)).all()


def test_regnet_backbone(rng):
    from u2seg_tpu.models.regnet import RegNet, generate_regnet_params

    ws, ds, gws = generate_regnet_params(38.65, 96, 2.43, 23, group_width=40)
    assert len(ws) == len(ds) == len(gws) and sum(ds) == 23
    assert all(w % g == 0 for w, g in zip(ws, gws))
    from u2seg_tpu.models.regnet import generate_regnet_params as gen

    m = RegNet(w_a=24.0, w_0=24, w_m=2.5, depth=8, group_width=8,
               stem_width=16, norm="BN")
    n_stages = len(gen(24.0, 24, 2.5, 8)[0])
    x = jnp.array(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert set(out) == {f"res{i + 2}" for i in range(n_stages)}
    # each stage halves resolution starting from stride-2 stem
    assert out["res2"].shape[1] == 64 // 4
    assert out[f"res{n_stages + 1}"].shape[1] == 64 // (2 ** (n_stages + 1))
    for k, f in out.items():
        assert np.isfinite(np.asarray(f)).all(), k


def test_mvit_backbone(rng):
    from u2seg_tpu.models.mvit import MViT

    m = MViT(embed_dim=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8))
    x = jnp.array(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out["res2"].shape == (1, 16, 16, 32)
    assert out["res3"].shape[1] == 8
    assert out["res5"].shape[1] == 2
    for k, f in out.items():
        assert np.isfinite(np.asarray(f)).all(), k
