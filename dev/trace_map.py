"""Map traced HLO op names of the full forward to source locations."""
from __future__ import annotations

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NAMES = sys.argv[1:] or [
    "fusion.80", "fusion.89", "fusion.1437", "fusion.62", "fusion.82",
    "reshape.1605", "reduce_window_max.14", "copy.1540", "fusion.296",
    "approx_top_k.118", "approx_top_k.88", "fusion.659", "fusion.210",
    "fusion.819", "fusion.152", "copy.1618", "slice_bitcast_fusion",
    "fusion.221", "fusion.815", "pad.93.clone", "copy.1715", "copy.1817",
    "fusion.63", "add_convert_fusion.4", "fusion.1494", "copy.1542",
]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.models.build import build_model

    cfg = Config()
    model = build_model(cfg)
    b, h, w = 4, 800, 1344
    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.array([[h, w]] * b, dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1], train=False
    )

    def forward(variables, images, sizes):
        out = model.apply(variables, images, sizes, train=False, combine=True)
        return out.detections.boxes, out.detections.scores, out.panoptic

    txt = jax.jit(forward).lower(variables, images, sizes).compile().as_text()
    for name in NAMES:
        pat = rf"%{re.escape(name)} = ([^\n]*)"
        m = re.search(pat, txt)
        if not m:
            print(f"{name}: NOT FOUND")
            continue
        line = m.group(1)
        shape = line.split(" ")[0]
        om = re.search(r'op_name="([^"]*)"', line)
        sf = re.search(r'source_file="([^"]*)" source_line=(\d+)', line)
        print(f"{name}: {shape}")
        print(f"   op={om.group(1)[:110] if om else '?'}")
        if sf:
            print(f"   at {sf.group(1).split('/')[-1]}:{sf.group(2)}")


if __name__ == "__main__":
    main()
