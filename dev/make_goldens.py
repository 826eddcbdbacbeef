"""Generate reference-parity golden fixtures (committed as .npz).

Executes the PURE-TORCH reference modules (matcher.py, box_regression.py)
from /root/reference with their tiny import surface stubbed out, runs them
on seeded random cases, and writes the inputs + outputs to
``tests/golden/fixtures/*.npz``. The committed fixtures numerically tie the
TPU build to the reference without the tests needing /root/reference,
torch, or any reference code at test time.

Run: python dev/make_goldens.py   (needs /root/reference + torch-cpu)
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch

REF = "/root/reference/detectron2"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "fixtures")


def load_ref_module(rel_path: str, name: str, stubs: dict) -> types.ModuleType:
    """Exec a single reference source file with stubbed imports."""
    import importlib.util

    saved = {}
    for mod_name, mod in stubs.items():
        saved[mod_name] = sys.modules.get(mod_name)
        sys.modules[mod_name] = mod
    try:
        path = os.path.join(REF, rel_path)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod           # so inspect/getsource resolve
        spec.loader.exec_module(mod)
        return mod
    finally:
        for mod_name, prev in saved.items():
            if prev is None:
                sys.modules.pop(mod_name, None)
            else:
                sys.modules[mod_name] = prev


def _stub(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _layers_stub():
    def nonzero_tuple(x):
        if x.dim() == 0:
            return x.unsqueeze(0).nonzero().unbind(1)
        return x.nonzero(as_tuple=True)

    return _stub(
        "detectron2.layers",
        nonzero_tuple=nonzero_tuple,
        cat=lambda ts, dim=0: torch.cat(ts, dim) if len(ts) > 1 else ts[0],
        ciou_loss=None, diou_loss=None,
    )


def gen_matcher():
    d2 = _stub("detectron2")
    matcher = load_ref_module(
        "modeling/matcher.py", "ref_matcher",
        {"detectron2": d2, "detectron2.layers": _layers_stub()},
    )

    rng = np.random.RandomState(0)
    cases = []
    # RPN config (0.3/0.7, low-quality) and ROI config (0.5, no low-quality)
    for thresholds, labels, allow_lq in [
        ([0.3, 0.7], [0, -1, 1], True),
        ([0.5], [0, 1], False),
        ([0.4, 0.6], [0, -1, 1], True),
    ]:
        m = matcher.Matcher(thresholds, labels, allow_low_quality_matches=allow_lq)
        for (ng, np_) in [(5, 40), (1, 7), (13, 111), (3, 1)]:
            q = rng.rand(ng, np_).astype(np.float32)
            # inject exact ties and exact-threshold values: the parity killers
            q[0, 0] = thresholds[0]
            if ng > 1:
                q[1, :3] = q[0, :3]
            idx, lab = m(torch.from_numpy(q))
            cases.append(dict(
                quality=q, thresholds=np.array(thresholds, np.float32),
                labels=np.array(labels, np.int32), allow_lq=np.array(allow_lq),
                match_idx=idx.numpy().astype(np.int64),
                match_labels=lab.numpy().astype(np.int64),
            ))
        # all-below-threshold / empty-ish edge
        q = (rng.rand(4, 9) * 0.05).astype(np.float32)
        idx, lab = m(torch.from_numpy(q))
        cases.append(dict(
            quality=q, thresholds=np.array(thresholds, np.float32),
            labels=np.array(labels, np.int32), allow_lq=np.array(allow_lq),
            match_idx=idx.numpy().astype(np.int64),
            match_labels=lab.numpy().astype(np.int64),
        ))
        # a gt that overlaps NOTHING (row of zeros): pins the low-quality
        # promotion behavior when a gt's best IoU is 0
        q = rng.rand(3, 12).astype(np.float32)
        q[1, :] = 0.0
        idx, lab = m(torch.from_numpy(q))
        cases.append(dict(
            quality=q, thresholds=np.array(thresholds, np.float32),
            labels=np.array(labels, np.int32), allow_lq=np.array(allow_lq),
            match_idx=idx.numpy().astype(np.int64),
            match_labels=lab.numpy().astype(np.int64),
        ))

    payload = {}
    for i, c in enumerate(cases):
        for k, v in c.items():
            payload[f"c{i}_{k}"] = v
    payload["n_cases"] = np.array(len(cases))
    np.savez(os.path.join(OUT, "matcher.npz"), **payload)
    print(f"matcher.npz: {len(cases)} cases")


def gen_box_transform():
    d2 = _stub("detectron2")
    structures = _stub("detectron2.structures", Boxes=object, RotatedBoxes=object)
    fvcore_nn = _stub("fvcore.nn", giou_loss=None, smooth_l1_loss=None)
    fvcore = _stub("fvcore", nn=fvcore_nn)
    boxreg = load_ref_module(
        "modeling/box_regression.py", "ref_box_regression",
        {"detectron2": d2, "detectron2.layers": _layers_stub(),
         "detectron2.structures": structures,
         "fvcore": fvcore, "fvcore.nn": fvcore_nn},
    )

    rng = np.random.RandomState(1)
    cases = []
    for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0),
                    (20.0, 20.0, 10.0, 10.0)]:
        t = boxreg.Box2BoxTransform(weights=weights)
        n = 64
        xy = rng.rand(n, 2).astype(np.float32) * 600
        wh = rng.rand(n, 2).astype(np.float32) * 200 + 1
        src = np.concatenate([xy, xy + wh], 1)
        xy2 = xy + rng.randn(n, 2).astype(np.float32) * 30
        wh2 = wh * np.exp(rng.randn(n, 2).astype(np.float32) * 0.4)
        tgt = np.concatenate([xy2, xy2 + wh2], 1).astype(np.float32)
        deltas = t.get_deltas(torch.from_numpy(src), torch.from_numpy(tgt))
        # apply with large deltas to exercise the dw/dh clamp
        big = deltas.clone()
        big[:4, 2:] = 10.0
        applied = t.apply_deltas(big, torch.from_numpy(src))
        cases.append(dict(
            weights=np.array(weights, np.float32), src=src, tgt=tgt,
            deltas=deltas.numpy(), big_deltas=big.numpy(),
            applied=applied.numpy(),
        ))
    payload = {}
    for i, c in enumerate(cases):
        for k, v in c.items():
            payload[f"c{i}_{k}"] = v
    payload["n_cases"] = np.array(len(cases))
    np.savez(os.path.join(OUT, "box_transform.npz"), **payload)
    print(f"box_transform.npz: {len(cases)} cases")


def gen_subsample_labels():
    d2 = _stub("detectron2")
    sampling = load_ref_module(
        "modeling/sampling.py", "ref_sampling",
        {"detectron2": d2, "detectron2.layers": _layers_stub()},
    )
    # subsample_labels is random; the parity-checkable invariants are the
    # counts. Record (labels, num_samples, positive_fraction, bg_label) ->
    # (num_pos_sampled, num_neg_sampled) across regimes incl. starvation.
    rng = np.random.RandomState(2)
    cases = []
    for n, num_samples, pos_frac, n_pos_avail in [
        (1000, 256, 0.5, 30), (1000, 256, 0.5, 500), (100, 256, 0.25, 0),
        (512, 512, 0.25, 40), (64, 256, 0.5, 64),
    ]:
        labels = torch.full((n,), 0, dtype=torch.int64)
        pos_idx_true = torch.from_numpy(
            rng.choice(n, size=n_pos_avail, replace=False)
        ) if n_pos_avail else torch.empty(0, dtype=torch.int64)
        labels[pos_idx_true] = 1
        # sprinkle ignores
        labels[:5] = -1
        pos, neg = sampling.subsample_labels(labels, num_samples, pos_frac, 0)
        cases.append(dict(
            n=np.array(n), num_samples=np.array(num_samples),
            pos_frac=np.array(pos_frac, np.float32),
            labels=labels.numpy().astype(np.int64),
            num_pos=np.array(len(pos)), num_neg=np.array(len(neg)),
        ))
    payload = {}
    for i, c in enumerate(cases):
        for k, v in c.items():
            payload[f"c{i}_{k}"] = v
    payload["n_cases"] = np.array(len(cases))
    np.savez(os.path.join(OUT, "subsample_labels.npz"), **payload)
    print(f"subsample_labels.npz: {len(cases)} cases")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_matcher()
    gen_box_transform()
    gen_subsample_labels()
