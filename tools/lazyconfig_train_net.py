#!/usr/bin/env python
"""Training driven by python-file LazyConfigs.

Counterpart of the reference ``tools/lazyconfig_train_net.py`` (do_train
:44): the config file is a python module whose module-level names define
the experiment; ``model``, ``optimizer``, ``dataloader`` and ``train``
nodes are instantiated recursively.

Example config (configs/lazy_example.py):

    from u2seg_tpu.config.lazy import LazyCall
    from u2seg_tpu.config.config import Config

    base = LazyCall(Config)()
    train = dict(max_iter=100, output_dir="./output/lazy")
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    from u2seg_tpu.config.lazy import LazyConfig, instantiate

    cfg = LazyConfig.load(args.config_file)
    LazyConfig.apply_overrides(cfg, [o for o in args.opts if "=" in o])

    base = instantiate(cfg.get("base"))
    if base is None:
        from u2seg_tpu.config.config import Config

        base = Config()
    train_opts = cfg.get("train", {})
    if "output_dir" in train_opts:
        base.output_dir = train_opts["output_dir"]

    from tools.plain_train_net import do_train

    do_train(base, max_iter=train_opts.get("max_iter"), resume=args.resume)


if __name__ == "__main__":
    main()
