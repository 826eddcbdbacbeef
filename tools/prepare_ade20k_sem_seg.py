#!/usr/bin/env python
"""Convert ADE20k annotations to training pngs (label-1, 255 ignore).

Counterpart of the reference datasets/prepare_ade20k_sem_seg.py.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from PIL import Image

    p = argparse.ArgumentParser()
    p.add_argument("--root", default="datasets/ADEChallengeData2016")
    args = p.parse_args()
    for split in ("training", "validation"):
        src = os.path.join(args.root, "annotations", split)
        dst = os.path.join(args.root, "annotations_detectron2", split)
        os.makedirs(dst, exist_ok=True)
        for f in sorted(os.listdir(src)):
            with Image.open(os.path.join(src, f)) as img:
                lab = np.asarray(img).astype(np.int16)
            # ADE20k: 0 = unlabeled -> 255; classes 1..150 -> 0..149
            out = np.where(lab == 0, 255, lab - 1).astype(np.uint8)
            Image.fromarray(out).save(os.path.join(dst, f))
            print("wrote", os.path.join(dst, f))


if __name__ == "__main__":
    main()
