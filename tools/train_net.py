#!/usr/bin/env python
"""Main training/eval CLI.

Counterpart of the reference ``tools/train_net.py`` (evaluator factory
:42-80, Trainer :83, main :125, launch :157) — TPU version: no process
spawning (SPMD over the local mesh; multi-host via jax.distributed), the
U2Seg ``--eval-mode {hungarian_matching,eval,auto}`` flag is preserved.

Usage:
  python tools/train_net.py --config-file configs/.../u2seg_R50_800.yaml
  python tools/train_net.py --config-file ... --eval-only \
      --eval-mode hungarian_matching model.weights=/path/ckpt
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def default_argument_parser():
    """ref engine/defaults.py:82 (incl. the U2Seg --eval-mode flag :117)."""
    parser = argparse.ArgumentParser(description="u2seg_tpu training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument(
        "--eval-mode", default="eval",
        choices=["hungarian_matching", "eval", "auto", "supervised"],
        help="U2Seg two-pass cluster matching mode ('auto' = single pass)",
    )
    parser.add_argument("--num-devices", type=int, default=0,
                        help="limit visible devices (0 = all)")
    parser.add_argument("--max-iter", type=int, default=0,
                        help="override solver.max_iter (0 = config value)")
    parser.add_argument(
        "opts", nargs=argparse.REMAINDER, default=[],
        help="config overrides: key.path=value ...",
    )
    return parser


def setup(args):
    from u2seg_tpu.config.config import load_config, save_config

    cfg = load_config(args.config_file or None, [o for o in args.opts if "=" in o])
    os.makedirs(cfg.output_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(name)s]: %(message)s",
        datefmt="%m/%d %H:%M:%S",
    )
    save_config(cfg, os.path.join(cfg.output_dir, "config.yaml"))
    return cfg


def build_train_loader(cfg, mesh):
    import jax

    from u2seg_tpu.data.builtin import register_all_coco
    from u2seg_tpu.data.catalog import DatasetCatalog
    from u2seg_tpu.data.loader import (
        build_detection_train_loader, filter_images_with_only_crowd_annotations,
    )
    from u2seg_tpu.data.mapper import DatasetMapper

    register_all_coco(cfg.datasets.root, cluster_num=cfg.datasets.cluster_num)
    dicts = []
    for name in cfg.datasets.train:
        dicts.extend(DatasetCatalog.get(name))
    if cfg.dataloader.filter_empty_annotations:
        dicts = filter_images_with_only_crowd_annotations(dicts)
    mapper = DatasetMapper(cfg, is_train=True)
    return build_detection_train_loader(
        dicts, mapper, total_batch_size=cfg.solver.ims_per_batch,
        seed=max(cfg.seed, 0),
        rank=jax.process_index(), world_size=jax.process_count(),
        num_workers=cfg.dataloader.num_workers,
        prefetch=cfg.dataloader.prefetch,
    )


def do_eval(cfg, args):
    from u2seg_tpu.engine.predictor import run_panoptic_evaluation

    return run_panoptic_evaluation(cfg, eval_mode=args.eval_mode)


def main():
    args = default_argument_parser().parse_args()
    cfg = setup(args)

    if args.eval_only:
        results = do_eval(cfg, args)
        print(results)
        return results

    from u2seg_tpu.engine.train_loop import DefaultTrainer
    from u2seg_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(args.num_devices or None)
    loader = build_train_loader(cfg, mesh)
    trainer = DefaultTrainer(cfg, loader, mesh=mesh)
    trainer.register_hooks(trainer.build_hooks())
    trainer.resume_or_load(resume=args.resume)
    trainer.train(args.max_iter or None)


if __name__ == "__main__":
    main()
