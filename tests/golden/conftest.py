"""Golden-fixture regeneration.

The full d2 PanopticFPN state dict is ~300 MB and deliberately NOT
committed (gitignored): it is deterministic (crc32-keyed seeding in
``dev/make_d2_state_dict.py``) and regenerated on demand from the
reference source at ``/root/reference``. The small activation fixture
(``d2_activations.npz``, 2.7 MB) IS committed — it was produced by the
same generator run, so a regenerated state dict reproduces it bit-exactly.
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
D2_STATE = os.path.join(FIXDIR, "d2_panoptic_fpn_state.npz")
_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


@pytest.fixture(scope="session")
def d2_state_path():
    """Path to the big d2 state dict, regenerating it if missing."""
    if not os.path.exists(D2_STATE):
        if not os.path.isdir("/root/reference/detectron2"):
            pytest.skip("d2 state fixture missing and /root/reference "
                        "unavailable to regenerate it")
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # keep off the TPU tunnel
        subprocess.run(
            [sys.executable, os.path.join(_REPO, "dev", "make_d2_state_dict.py")],
            check=True, cwd=_REPO, env=env, timeout=900,
        )
    return D2_STATE
