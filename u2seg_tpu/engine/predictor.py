"""Inference APIs: single-image predictor + dataset evaluation driver.

Counterpart of ``detectron2/engine/defaults.py:253`` (DefaultPredictor) and
the eval-only path of ``tools/train_net.py`` + ``DefaultTrainer.test``
(defaults.py:580). Also hosts the host-side postprocessing that turns
device ``Detections`` into original-resolution COCO records
(ref ``modeling/postprocessing.py:9`` detector_postprocess +
``coco_evaluation.py:483`` instances_to_coco_json).
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from u2seg_tpu.config.config import Config

logger = logging.getLogger(__name__)


def detections_to_records(
    boxes: np.ndarray,          # (K, 4) XYXY network-input coords
    scores: np.ndarray,
    classes: np.ndarray,
    valid: np.ndarray,
    mask_logits: Optional[np.ndarray],   # (K, M, M)
    input_hw: Tuple[int, int],
    orig_hw: Tuple[int, int],
    mask_threshold: float = 0.5,
) -> dict:
    """Rescale to the original resolution and paste masks (host-side exact
    path: per-box grid-sample bilinear, ref mask_ops.py:17-140)."""
    from u2seg_tpu.engine.panoptic_render import paste_mask_exact
    from u2seg_tpu.evaluation import rle as rle_codec

    ih, iw = input_hw
    oh, ow = orig_hw
    sel = np.asarray(valid).astype(bool)
    b = np.asarray(boxes)[sel].astype(np.float64)
    scale_x, scale_y = ow / iw, oh / ih
    b[:, 0::2] *= scale_x
    b[:, 1::2] *= scale_y
    b[:, 0::2] = b[:, 0::2].clip(0, ow)
    b[:, 1::2] = b[:, 1::2].clip(0, oh)
    out = {
        "boxes": b,
        "scores": np.asarray(scores)[sel],
        "classes": np.asarray(classes)[sel],
    }
    if mask_logits is not None:
        rles = []
        full_masks = []
        ml = np.asarray(mask_logits, np.float32)[sel]
        for i in range(len(b)):
            prob = 1.0 / (1.0 + np.exp(-ml[i]))
            ys, xs, sub = paste_mask_exact(prob, b[i], oh, ow)
            canvas = np.zeros((oh, ow), np.uint8)
            canvas[ys, xs] = sub >= mask_threshold
            r = rle_codec.encode(canvas)
            r["counts"] = r["counts"].decode("ascii")
            rles.append(r)
            full_masks.append(canvas)
        out["rles"] = rles
        out["masks"] = full_masks
    return out


class DefaultPredictor:
    """Single-image panoptic predictor (ref defaults.py:253).

    Takes a raw BGR or RGB uint8 image, resizes the shortest edge to the
    test size, pads to a bucket, runs the jitted model, and returns
    original-resolution outputs.
    """

    def __init__(self, cfg: Config, variables=None, model=None):
        import jax

        from u2seg_tpu.data import transforms as T
        from u2seg_tpu.models.build import build_model

        self.cfg = cfg
        self.model = model if model is not None else build_model(cfg)
        # link accounting for the batched drain (read by bench.py):
        # number of device_get transfers and fetched bytes
        self.fetch_stats = {"fetches": 0, "bytes": 0}
        self.aug = T.ResizeShortestEdge(
            (cfg.input.min_size_test,), cfg.input.max_size_test
        )
        self.input_format = cfg.model.input_format
        self.buckets = tuple(cfg.input.pad_buckets)
        if variables is None:
            import jax.numpy as jnp

            h, w = self.buckets[0]
            # jit the init: eagerly it is thousands of individually
            # dispatched ops, which on a high-RTT remote backend (the dev
            # tunnel: ~29 ms RTT) takes minutes; as one compiled program
            # it is one round trip (and persistent-cache friendly)
            variables = jax.jit(
                lambda r, x, s: self.model.init(r, x, s, train=False)
            )(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, h, w, 3)), jnp.array([[h, w]], jnp.int32),
            )
        self.variables = variables

        def fwd(variables, image, size):
            # fusion happens host-side at full resolution
            # (engine/panoptic_render.py), so no on-device combine here
            return self.model.apply(
                variables, image, size, train=False, combine=False
            )

        self._fwd = jax.jit(fwd)

        def render_tail(out, size, orig_size):
            from u2seg_tpu.engine.device_render import (
                pack_fetch_buffer, pack_rendered_batch, render_batch,
            )
            pano = cfg.model.panoptic
            bsz = size.shape[0]
            rendered = pack_rendered_batch(render_batch(
                out.detections, out.sem_seg_logits, size, orig_size,
                canvas=tuple(cfg.test.render_canvas),
                k_fuse=cfg.test.render_k_fuse,
                max_runs=cfg.test.render_max_runs,
                instance_conf_thresh=pano.instance_conf_thresh,
                overlap_thresh=pano.overlap_thresh,
                stuff_area_limit=pano.stuff_area_limit,
            ), prefix=bsz * cfg.test.fetch_runs_per_image)
            det = out.detections
            small_det = {
                "boxes": det.boxes, "scores": det.scores,
                "classes": det.classes, "valid": det.valid,
            }
            # everything the host needs in the common case rides ONE
            # contiguous buffer = ONE device_get = ONE link round trip
            buf = pack_fetch_buffer(rendered, small_det)
            # full run buffers + logits returned for rare fallbacks; they
            # are fetched only when touched, so no per-batch transfer cost
            return buf, rendered, det.mask_logits, out.sem_seg_logits

        def fwd_render(variables, image, size, orig_size):
            # TPU-first eval path: exact full-res render on device, host
            # fetches RLE maps + segment tables (engine/device_render.py)
            out = self.model.apply(
                variables, image, size, train=False, combine=False
            )
            return render_tail(out, size, orig_size)

        self._fwd_render = jax.jit(fwd_render)

        def fwd_render_raw(variables, raw, orig_size, size, bucket):
            # raw-u8 upload variant: the test-time resize happens on device
            # (device_render.resize_image_device), cutting host->device
            # bytes another ~3.5x. `bucket` (static) is the network-input
            # pad bucket for this group.
            import jax.numpy as jnp

            from u2seg_tpu.engine.device_render import resize_image_device

            resized = jax.vmap(
                lambda r, o, s: resize_image_device(r, o, s, bucket)
            )(raw, orig_size, size)
            out = self.model.apply(
                variables, resized, size, train=False, combine=False
            )
            return render_tail(out, size, orig_size)

        self._fwd_render_raw = jax.jit(
            fwd_render_raw, static_argnames=("bucket",))

    def _channels(self, original_image: np.ndarray) -> np.ndarray:
        if self.input_format == "RGB" and original_image.shape[-1] == 3:
            return original_image
        return original_image[:, :, ::-1]

    def _prepare(self, original_image: np.ndarray):
        """Raw image -> (bucket-padded f32 input, (h, w), (oh, ow)).

        The canonical test-time resize is FLOAT bilinear (half-pixel
        centers, border replicate): resizing in f32 makes this host path
        and the on-device resize (device_render.resize_image_device)
        agree to f32 rounding, where a uint8 resize would quantize."""
        from u2seg_tpu.data import transforms as T

        image = self._channels(original_image)
        oh, ow = image.shape[:2]
        rng = np.random.RandomState(0)
        tfm = self.aug.get_transform(image, rng)
        image = tfm.apply_image(image.astype(np.float32))
        h, w = image.shape[:2]
        bh, bw = T.pick_bucket(h, w, self.buckets)
        if h > bh or w > bw:
            s = min(bh / h, bw / w)
            rescale = T.ResizeTransform(h, w, int(h * s), int(w * s))
            image = rescale.apply_image(image)
            h, w = image.shape[:2]
        padded = np.zeros((bh, bw, 3), np.float32)
        padded[:h, :w] = image
        return padded, (h, w), (oh, ow)

    def _prepare_raw(self, original_image: np.ndarray):
        """Raw image -> (raw-bucket-padded u8, (ih, iw), (oh, ow), bucket)
        for the device-resize path, or None if no raw bucket fits (the
        caller then uses the host-resize path for this image)."""
        from u2seg_tpu.data import transforms as T

        image = self._channels(original_image)
        oh, ow = image.shape[:2]
        raw_buckets = tuple(self.cfg.test.raw_buckets)
        if not any(bh >= oh and bw >= ow for bh, bw in raw_buckets):
            return None
        size = self.cfg.input.min_size_test
        ih, iw = T.ResizeShortestEdge.get_output_shape(
            oh, ow, size, self.cfg.input.max_size_test)
        bh, bw = T.pick_bucket(ih, iw, self.buckets)
        if ih > bh or iw > bw:  # shrink-to-bucket (host path does the same)
            s = min(bh / ih, bw / iw)
            ih, iw = int(ih * s), int(iw * s)
        rh, rw = T.pick_bucket(oh, ow, raw_buckets)
        padded = np.zeros((rh, rw, 3), np.uint8)
        padded[:oh, :ow] = image
        return padded, (ih, iw), (oh, ow), (bh, bw)

    def _post(self, det_np: dict, sem_logits_np: Optional[np.ndarray],
              input_hw: Tuple[int, int], orig_hw: Tuple[int, int]) -> dict:
        """Host-side per-image postprocess on already-fetched arrays."""
        records = detections_to_records(
            det_np["boxes"], det_np["scores"], det_np["classes"],
            det_np["valid"], det_np.get("mask_logits"), input_hw, orig_hw,
        )
        result = {"instances": records}
        if sem_logits_np is None:
            return result
        # exact full-resolution semantic + panoptic render
        # (ref sem_seg_postprocess + combine_semantic_and_instance_outputs)
        from u2seg_tpu.engine.panoptic_render import render_panoptic_output

        pano_cfg = self.cfg.model.panoptic
        sem, pan, segments = render_panoptic_output(
            det_np["boxes"], det_np["scores"], det_np["classes"],
            det_np["valid"], det_np.get("mask_logits"), sem_logits_np,
            input_hw, orig_hw,
            instance_conf_thresh=pano_cfg.instance_conf_thresh,
            overlap_thresh=pano_cfg.overlap_thresh,
            stuff_area_limit=pano_cfg.stuff_area_limit,
        )
        result["sem_seg"] = sem
        result["panoptic"] = pan
        result["segments"] = segments
        return result

    @staticmethod
    def _fetch_image(out, i: int):
        """Slice image ``i`` of a device output pytree to host numpy."""
        det = out.detections
        det_np = {
            "boxes": np.asarray(det.boxes[i]),
            "scores": np.asarray(det.scores[i]),
            "classes": np.asarray(det.classes[i]),
            "valid": np.asarray(det.valid[i]),
        }
        if det.mask_logits is not None:
            det_np["mask_logits"] = np.asarray(det.mask_logits[i])
        sem = (np.asarray(out.sem_seg_logits[i])
               if getattr(out, "sem_seg_logits", None) is not None else None)
        return det_np, sem

    def __call__(self, original_image: np.ndarray) -> dict:
        import jax.numpy as jnp

        padded, hw, ohow = self._prepare(original_image)
        out = self._fwd(
            self.variables, jnp.asarray(padded[None]),
            jnp.array([list(hw)], jnp.int32),
        )
        det_np, sem_np = self._fetch_image(out, 0)
        return self._post(det_np, sem_np, hw, ohow)

    def _drain_rendered(self, group, n_real, out):
        """Decode one in-flight device-rendered batch.

        ONE device_get covers the common case: every host-needed field —
        per-image tables, run offsets, AND a static prefix of the
        batch-compacted RLE buffers (sized by
        ``cfg.test.fetch_runs_per_image``) — is flattened on device into a
        single contiguous uint8 buffer (device_render.pack_fetch_buffer),
        so the per-batch link cost is one RTT + ~0.02 MB/img of bytes
        instead of one RTT per pytree leaf. Only a batch whose total run
        count overflows the prefix pays a second fetch (dynamic slice at
        power-of-two lengths so at most O(log) shapes compile)."""
        import jax

        from u2seg_tpu.engine.device_render import (
            decode_rendered_image, fetch_layout, unpack_fetch_buffer,
        )

        buf, rendered, mask_logits, sem_logits = out
        bsz, k_fuse = rendered.takes.shape
        layout = fetch_layout(
            bsz, k_det=self.cfg.model.roi_heads.detections_per_image,
            k_fuse=k_fuse, num_stuff=rendered.stuff_ok.shape[1],
            prefix=rendered.starts_prefix.shape[0],
        )
        host = np.asarray(jax.device_get(buf))
        self.fetch_stats["fetches"] += 1
        self.fetch_stats["bytes"] += int(host.size)
        rend = unpack_fetch_buffer(host, layout)
        offs = rend["offs"].astype(np.int64)
        total = int(offs[-1])
        self.fetch_stats["runs"] = self.fetch_stats.get("runs", 0) + total
        self.fetch_stats["runs_max_batch"] = max(
            self.fetch_stats.get("runs_max_batch", 0), total)
        starts_c, values_c = rend["starts"], rend["values"]
        if total > len(starts_c):
            cap = rendered.starts.shape[0]
            cut = 4096
            while cut < total:
                cut *= 2
            cut = min(cut, cap)
            starts_c, values_c = jax.device_get(
                (rendered.starts[:cut], rendered.values[:cut]))
            self.fetch_stats["fetches"] += 2
            self.fetch_stats["bytes"] += 6 * cut
        canvas = tuple(self.cfg.test.render_canvas)
        for i in range(n_real):
            meta, _, hw, ohow = group[i]
            det_i = {
                "boxes": rend["det_boxes"][i],
                "scores": rend["det_scores"][i],
                "classes": rend["det_classes"][i],
                "valid": rend["det_valid"][i].astype(bool),
            }
            if bool(rend["fallback"][i]):
                # exact host re-render (image exceeds the canvas / run or
                # fusion budget); logits are fetched only here
                if mask_logits is not None:
                    det_i["mask_logits"] = np.asarray(mask_logits[i])
                sem_np = np.asarray(sem_logits[i])
                self.fetch_stats["fetches"] += 2
                yield meta, self._post(det_i, sem_np, tuple(hw), ohow)
                continue
            records = detections_to_records(
                det_i["boxes"], det_i["scores"], det_i["classes"],
                det_i["valid"], None, tuple(hw), ohow,
            )
            p0, p1, p2 = offs[2 * i], offs[2 * i + 1], offs[2 * i + 2]
            r = {
                "takes": rend["takes"][i].astype(bool),
                "order": rend["order"][i],
                "sorted_scores": rend["sorted_scores"][i],
                "sorted_classes": rend["sorted_classes"][i],
                "stuff_ok": rend["stuff_ok"][i].astype(bool),
                "stuff_area": rend["stuff_area"][i],
                "pan_starts": starts_c[p0:p1],
                "pan_values": values_c[p0:p1],
                "pan_nruns": p1 - p0,
                "sem_starts": starts_c[p1:p2],
                "sem_values": values_c[p1:p2],
                "sem_nruns": p2 - p1,
                "det_valid": det_i["valid"],
            }
            sem, pan, segments = decode_rendered_image(r, canvas, ohow)
            yield meta, {
                "instances": records, "sem_seg": sem,
                "panoptic": pan, "segments": segments,
            }

    def run_batched(self, examples, batch_size: int = 4,
                    device_render: bool = False,
                    device_resize: bool = False):
        """Batched, pipelined inference over ``(meta, image)`` pairs.

        The reference evaluates test sets one image at a time
        (``evaluator.py:103``; DefaultPredictor defaults.py:253). On TPU
        that leaves the chip idle during every host postprocess, so this
        path (a) groups same-bucket images into device batches and (b)
        keeps one batch in flight: batch ``i+1`` is dispatched before batch
        ``i``'s outputs are fetched, overlapping device compute with the
        host-side mask paste / panoptic render (SURVEY §7 hard part 6).

        Yields ``(meta, result_dict)`` in same-bucket-grouped order —
        identical per-image results to ``__call__``. Partial tail groups
        are padded by repeating the last image so each bucket compiles
        exactly once per batch size.

        The d2h fetch and the host-side decode of each in-flight batch run
        on worker threads (device_get + numpy decode both release the GIL
        for their hot parts), so the main thread's prepare->upload->dispatch
        loop never stalls behind them; with DEPTH batches in flight the
        steady state is bounded by max(link, device) rather than their sum.
        """
        import jax.numpy as jnp
        from collections import defaultdict, deque
        from concurrent.futures import ThreadPoolExecutor

        DEPTH = 3  # batches in flight (device queue + one being decoded)
        buffers: Dict[tuple, list] = defaultdict(list)
        pending: deque = deque()
        pool = ThreadPoolExecutor(max_workers=2)

        def fetch_host(group, n_real, out):
            results = []
            for i in range(n_real):
                meta, _, hw, ohow = group[i]
                det_np, sem_np = self._fetch_image(out, i)
                results.append(
                    (meta, self._post(det_np, sem_np, tuple(hw), ohow)))
            return results

        def dispatch(key, group, n_real):
            stack = jnp.asarray(np.stack([g[1] for g in group]))
            sizes = jnp.asarray(
                np.array([g[2] for g in group], np.int32))
            if key[0] == "raw":
                osizes = jnp.asarray(
                    np.array([g[3] for g in group], np.int32))
                out = self._fwd_render_raw(
                    self.variables, stack, osizes, sizes, bucket=key[2])
                fut = pool.submit(
                    lambda: list(self._drain_rendered(group, n_real, out)))
            elif device_render:
                osizes = jnp.asarray(
                    np.array([g[3] for g in group], np.int32))
                out = self._fwd_render(
                    self.variables, stack, sizes, osizes)  # async dispatch
                fut = pool.submit(
                    lambda: list(self._drain_rendered(group, n_real, out)))
            else:
                out = self._fwd(self.variables, stack, sizes)
                fut = pool.submit(fetch_host, group, n_real, out)
            pending.append(fut)

        try:
            for meta, image in examples:
                prepared = None
                if device_render and device_resize:
                    prepared = self._prepare_raw(image)
                if prepared is not None:
                    padded, hw, ohow, bucket = prepared
                    key = ("raw", padded.shape[:2], bucket)
                    entry = (meta, padded, hw, ohow)
                else:
                    padded, hw, ohow = self._prepare(image)
                    key = ("host", padded.shape[:2])
                    entry = (meta, padded, hw, ohow)
                buf = buffers[key]
                buf.append(entry)
                if len(buf) == batch_size:
                    dispatch(key, buf, batch_size)
                    buffers[key] = []
                    while len(pending) > DEPTH - 1:
                        yield from pending.popleft().result()
            for key, buf in buffers.items():
                if not buf:
                    continue
                n_real = len(buf)
                while len(buf) < batch_size:
                    buf.append(buf[-1])
                dispatch(key, buf, n_real)
            while pending:
                yield from pending.popleft().result()
        finally:
            # cancel queued work so a consumer abandoning the generator
            # mid-stream doesn't leave detached futures whose exceptions
            # would be silently dropped
            pool.shutdown(wait=False, cancel_futures=True)


def build_u2seg_evaluators(cfg: Config, meta, eval_mode: str,
                           matching_dir: str = "./hungarian_matching"):
    """Evaluator stack for the U2Seg protocol (the factory the reference
    keeps in tools/train_net.py:42-80): instance AP + semantic mIoU +
    panoptic PQ, each wired to the cluster-matching mode."""
    from u2seg_tpu.data.builtin_meta import (
        NUM_SUPERCATEGORIES, thing_dataset_id_to_contiguous_id,
    )
    from u2seg_tpu.evaluation.coco_api import COCO
    from u2seg_tpu.evaluation.coco_evaluator import COCOEvaluator
    from u2seg_tpu.evaluation.evaluator import DatasetEvaluators
    from u2seg_tpu.evaluation.panoptic_evaluator import COCOPanopticEvaluator
    from u2seg_tpu.evaluation.sem_seg_evaluator import SemSegEvaluator

    cluster_num = cfg.datasets.cluster_num
    coco_gt = COCO(meta.json_file)
    evals = [
        SemSegEvaluator(
            mode=eval_mode,
            num_pred_classes=cfg.model.sem_seg_head.num_classes,
            matching_dir=matching_dir,
        ),
        COCOEvaluator(
            coco_gt, mode=eval_mode, num_clusters=cluster_num,
            matching_dir=matching_dir,
            tasks=("bbox",),   # segm skipped in the protocol (ref :353-354)
        ),
    ]
    pan_json = meta.get("panoptic_json")
    if pan_json and os.path.exists(pan_json):
        thing_c2d = {
            v: k for k, v in thing_dataset_id_to_contiguous_id().items()
        }
        categories = {}
        for did in thing_c2d.values():
            categories[did] = {"id": did, "isthing": 1}
        for s in range(1, NUM_SUPERCATEGORIES + 1):
            categories[cluster_num + s] = {
                "id": cluster_num + s, "isthing": 0,
            }
        evals.append(COCOPanopticEvaluator(
            categories, thing_c2d, cluster_num=cluster_num,
            matching_dir=matching_dir,
            mode="eval" if eval_mode in ("eval", "auto") else eval_mode,
        ))
    return DatasetEvaluators(evals), pan_json


def run_panoptic_evaluation(cfg: Config, eval_mode: str = "auto") -> dict:
    """Dataset evaluation driver: loader -> jitted model -> postprocess ->
    {SemSeg, COCO, Panoptic} evaluators (the eval-only path of
    tools/train_net.py:125-138 + DefaultTrainer.test defaults.py:580)."""
    import json as jsonlib

    import jax

    from u2seg_tpu.data.builtin import register_all_coco
    from u2seg_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from u2seg_tpu.data.loader import InferenceSampler
    from u2seg_tpu.data.mapper import read_image

    register_all_coco(cfg.datasets.root, cluster_num=cfg.datasets.cluster_num)
    results = {}
    for dataset_name in cfg.datasets.test:
        dicts = DatasetCatalog.get(dataset_name)
        meta = MetadataCatalog.get(dataset_name)
        evaluator, pan_json = build_u2seg_evaluators(cfg, meta, eval_mode)
        pan_gt_by_image = {}
        if pan_json and os.path.exists(pan_json):
            with open(pan_json) as f:
                pj = jsonlib.load(f)
            pan_gt_by_image = {
                a["image_id"]: a for a in pj.get("annotations", [])
            }
        predictor = DefaultPredictor(cfg)
        evaluator.reset()
        sampler = InferenceSampler(
            len(dicts), jax.process_index(), jax.process_count()
        )

        def load_example(idx):
            """Image + per-image GT reads (threaded: IO releases the GIL)."""
            d = dicts[idx]
            img = read_image(d["file_name"], cfg.model.input_format)
            inp = {"image_id": d["image_id"]}
            if "sem_seg_file_name" in d:
                from PIL import Image

                with Image.open(d["sem_seg_file_name"]) as s:
                    inp["sem_seg_gt"] = np.asarray(s).astype(np.int64)
            gt_ann = pan_gt_by_image.get(d["image_id"])
            if gt_ann is not None:
                from u2seg_tpu.pseudo.assembly import read_panoptic_png

                pan_root = meta.get("panoptic_root", "")
                inp["pan_gt"] = read_panoptic_png(
                    os.path.join(pan_root, gt_ann["file_name"])
                )
                inp["gt_segments"] = gt_ann["segments_info"]
            return inp, img

        def examples():
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            workers = max(cfg.dataloader.num_workers, 1)
            with ThreadPoolExecutor(max_workers=workers) as pool:
                futs = deque()
                for idx in sampler:
                    futs.append(pool.submit(load_example, idx))
                    if len(futs) >= 2 * workers:
                        yield futs.popleft().result()
                while futs:
                    yield futs.popleft().result()

        if hasattr(predictor, "run_batched"):
            # batched + one-batch-in-flight pipelined device path
            stream = predictor.run_batched(
                examples(), batch_size=cfg.test.ims_per_batch,
                device_render=cfg.test.device_render,
                device_resize=cfg.test.device_resize)
        else:  # per-image path (kept for stub predictors / tests)
            stream = ((inp, predictor(img)) for inp, img in examples())

        for inp, out in stream:
            out_rec = {
                "instances": out["instances"],
                "sem_seg": out.get("sem_seg"),
            }
            if "panoptic" in out:
                out_rec["panoptic"] = out["panoptic"]
                out_rec["segments"] = out["segments"]
            evaluator.process([inp], [out_rec])
        results[dataset_name] = evaluator.evaluate()
    return results
