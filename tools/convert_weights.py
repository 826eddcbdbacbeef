#!/usr/bin/env python
"""Convert reference checkpoints to this framework's format.

Counterpart of ``tools/convert-torchvision-to-d2.py`` and the checkpoint
interop requirement (SURVEY.md §7.5): loads a detectron2 ``.pkl`` or torch
``.pth`` PanopticFPN checkpoint (e.g. the released U2Seg 800-cluster
weights, or the DINO-pretrained R50) and writes an orbax checkpoint with
our parameter tree, ready for ``model.weights``.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help=".pkl or .pth checkpoint")
    parser.add_argument("--output", required=True, help="output checkpoint dir")
    parser.add_argument("--num-stages", type=int, default=3,
                        help="cascade stages (1 = StandardROIHeads)")
    args = parser.parse_args()

    from u2seg_tpu.engine.checkpoint import (
        Checkpointer, convert_d2_panoptic_fpn, load_reference_state_dict,
    )

    ref = load_reference_state_dict(args.input)
    print(f"loaded {len(ref)} tensors from {args.input}")
    params, stats = convert_d2_panoptic_fpn(ref, num_stages=args.num_stages)
    ckptr = Checkpointer(os.path.dirname(args.output) or ".")
    ckptr.save(os.path.basename(args.output),
               {"params": params, "batch_stats": stats})
    print("wrote", args.output)


if __name__ == "__main__":
    main()
