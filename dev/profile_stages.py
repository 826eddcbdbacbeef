"""Stage-wise timing of the PanopticFPN inference path on the real chip.

Times successively larger prefixes of the model to locate the bottleneck:
backbone -> +semseg -> +RPN -> +ROI boxes+masks -> +fusion (full).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _ensure_tpu_or_reexec(max_tries: int = 6, wait_s: int = 60) -> None:
    """Same recovery as bench.py: the axon tunnel admits one client; a failed
    registration is only retryable in a FRESH process."""
    import os
    import sys
    import time

    import jax

    try:
        jax.devices()
        return
    except RuntimeError as e:
        tries = int(os.environ.get("U2SEG_BENCH_TRIES", "0"))
        if tries >= max_tries or "axon" not in str(e):
            raise
        sys.stderr.write(f"TPU unavailable; retry {tries + 1}/{max_tries}\n")
        time.sleep(wait_s)
        os.environ["U2SEG_BENCH_TRIES"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    _ensure_tpu_or_reexec()
    import jax
    import jax.numpy as jnp

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.models.build import build_model

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    print("devices:", jax.devices(), flush=True)

    cfg = Config()
    model = build_model(cfg)

    b, h, w = int(os.environ.get("PROF_BATCH", "4")), 800, 1344
    # generate on device: a (8, 800, 1344, 3) f32 upload is 103 MB — many
    # minutes on the dev tunnel when the link is slow
    images = jax.jit(
        lambda k: jax.random.uniform(k, (b, h, w, 3)) * 255.0,
    )(jax.random.PRNGKey(0))
    images.block_until_ready()
    sizes = jnp.array([[h, w]] * b, dtype=jnp.int32)
    # jitted init: one program instead of thousands of eager remote ops
    variables = jax.jit(
        lambda r, x, s: model.init(r, x, s, train=False)
    )({"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1])
    jax.block_until_ready(variables)
    print("init done", flush=True)

    def sync(o):
        return np.asarray(jax.tree_util.tree_leaves(o)[0]).sum()

    def timeit(name, fn, *args, iters=10):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s} {dt*1000:8.2f} ms/batch  {b/dt:7.1f} img/s", flush=True)
        return dt

    m = model

    def _scalar(*leaves):
        return sum(l.astype(jnp.float32).sum() for l in leaves)

    @jax.jit
    def f_backbone(v, x):
        feats = m.bind(v).backbone(m.bind(v).normalize(x), train=False)
        return _scalar(*feats.values())

    @jax.jit
    def f_semseg(v, x):
        mm = m.bind(v)
        feats = mm.backbone(mm.normalize(x), train=False)
        logits, _ = mm.sem_seg_head(feats, None, train=False)
        return _scalar(logits)

    @jax.jit
    def f_rpn(v, x, s):
        mm = m.bind(v)
        feats = mm.backbone(mm.normalize(x), train=False)
        out = mm.proposal_generator(feats, s, train=False)
        return _scalar(out.proposal_boxes)

    @jax.jit
    def f_roi_box(v, x, s):
        """Through the cascade box stages + fast_rcnn_inference, no mask."""
        mm = m.bind(v)
        feats = mm.backbone(mm.normalize(x), train=False)
        rpn_out = mm.proposal_generator(feats, s, train=False)
        rh = mm.roi_heads
        boxes = rpn_out.proposal_boxes
        stage_scores = []
        for st in range(len(rh.cfg.cascade_ious)):
            scores_p, deltas_p = rh._run_stage(feats, boxes, st, False)
            boxes = rh._refine(deltas_p, boxes, st, s)
            stage_scores.append(scores_p)
        return _scalar(boxes, *stage_scores)

    @jax.jit
    def f_pool1(v, x, s):
        """Backbone + RPN + ONE 7x7 pool over the real RPN boxes."""
        mm = m.bind(v)
        feats = mm.backbone(mm.normalize(x), train=False)
        rpn_out = mm.proposal_generator(feats, s, train=False)
        rh = mm.roi_heads
        pooled = rh._pool(feats, rpn_out.proposal_boxes,
                          rh.cfg.box_head.pooler_resolution,
                          rh.cfg.box_head.pooler_sampling_ratio)
        return _scalar(pooled)

    @jax.jit
    def f_stage1(v, x, s):
        """Backbone + RPN + one full cascade stage (pool+2FC+predictor)."""
        mm = m.bind(v)
        feats = mm.backbone(mm.normalize(x), train=False)
        rpn_out = mm.proposal_generator(feats, s, train=False)
        rh = mm.roi_heads
        scores_p, deltas_p = rh._run_stage(
            feats, rpn_out.proposal_boxes, 0, False)
        return _scalar(scores_p, deltas_p)

    @jax.jit
    def f_roi(v, x, s):
        mm = m.bind(v)
        feats = mm.backbone(mm.normalize(x), train=False)
        rpn_out = mm.proposal_generator(feats, s, train=False)
        det = mm.roi_heads(
            feats, rpn_out.proposal_boxes, rpn_out.proposal_scores,
            rpn_out.proposal_valid, s, train=False)
        return _scalar(det.boxes, det.scores, det.mask_logits)

    @jax.jit
    def f_nofuse(v, x, s):
        out = m.apply(v, x, s, train=False, combine=False)
        return _scalar(out.detections.boxes, out.detections.scores,
                       out.detections.mask_logits, out.sem_seg_logits)

    @jax.jit
    def f_full(v, x, s):
        out = m.apply(v, x, s, train=False, combine=True)
        return _scalar(out.detections.boxes, out.detections.scores,
                       out.panoptic.astype(jnp.float32))

    if os.environ.get("PROF_ONLY_FULL"):
        timeit("all but fusion", f_nofuse, variables, images, sizes)
        timeit("full (+fusion)", f_full, variables, images, sizes)
        return

    timeit("backbone(R50+FPN)", f_backbone, variables, images)
    timeit("+semseg head", f_semseg, variables, images)
    timeit("+RPN (topk+NMS)", f_rpn, variables, images, sizes)
    timeit("+pool1 (7x7, RPN boxes)", f_pool1, variables, images, sizes)
    timeit("+stage1 (pool+FC+pred)", f_stage1, variables, images, sizes)
    timeit("+cascade box stages", f_roi_box, variables, images, sizes)
    timeit("+ROI heads (casc+mask)", f_roi, variables, images, sizes)
    timeit("all but fusion", f_nofuse, variables, images, sizes)
    timeit("full (+fusion)", f_full, variables, images, sizes)


if __name__ == "__main__":
    main()
