"""Registry / PathManager / PicklableWrapper (ref detectron2/utils/
registry.py, file_io.py, serialize.py)."""
import os
import pickle

import pytest

from u2seg_tpu.utils.file_io import PathManager, PathHandler
from u2seg_tpu.utils.registry import Registry, locate
from u2seg_tpu.utils.serialize import PicklableWrapper


def test_registry_decorator_and_explicit():
    reg = Registry("TEST")

    @reg.register()
    class Thing:
        pass

    def other():
        pass

    reg.register(other)
    assert reg.get("Thing") is Thing
    assert reg.get("other") is other
    assert "Thing" in reg and "missing" not in reg
    assert dict(iter(reg))["Thing"] is Thing
    with pytest.raises(ValueError):
        reg.register(Thing)
    with pytest.raises(KeyError):
        reg.get("missing")


def test_locate_dotted_paths():
    import u2seg_tpu.utils.registry as mod

    assert locate("u2seg_tpu.utils.registry.Registry") is Registry
    assert locate("u2seg_tpu.utils.registry") is mod
    # nested attribute pydoc.locate alone can miss
    assert locate("u2seg_tpu.utils.registry.Registry.get") is Registry.get
    with pytest.raises(ImportError):
        locate("u2seg_tpu.no.such.thing")


def test_pathmanager_local_and_scheme(tmp_path, monkeypatch):
    p = tmp_path / "a.txt"
    with PathManager.open(str(p), "w") as f:
        f.write("hi")
    assert PathManager.exists(str(p)) and PathManager.isfile(str(p))
    assert PathManager.ls(str(tmp_path)) == ["a.txt"]

    monkeypatch.setenv("U2SEG_CACHE", str(tmp_path / "cache"))
    uri = "u2seg://ckpt/m.txt"
    assert PathManager.get_local_path(uri) == str(
        tmp_path / "cache" / "ckpt" / "m.txt")
    with PathManager.open(uri, "w") as f:   # auto-mkdirs on write
        f.write("w")
    assert PathManager.exists(uri)
    PathManager.copy(uri, str(tmp_path / "b.txt"))
    assert open(tmp_path / "b.txt").read() == "w"
    PathManager.rm(uri)
    assert not PathManager.exists(uri)


def test_pathmanager_custom_handler(tmp_path):
    class H(PathHandler):
        PREFIX = "testx://"

        def get_local_path(self, path):
            return os.path.join(str(tmp_path), path[len(self.PREFIX):])

    PathManager.register_handler(H())
    assert PathManager.get_local_path("testx://z") == str(tmp_path / "z")


def test_picklable_wrapper_lambda_roundtrip():
    w = PicklableWrapper(lambda x: x * 3)
    w2 = pickle.loads(pickle.dumps(w))
    assert w2(4) == 12
    # re-wrap is flattened; attribute forwarding works
    assert PicklableWrapper(w)._obj is w._obj

    class WithAttr:
        field = 7

        def __call__(self):
            return "ok"

    ww = PicklableWrapper(WithAttr())
    assert ww.field == 7 and ww() == "ok"
    assert pickle.loads(pickle.dumps(ww))() == "ok"
