"""Model export & deployment.

Counterpart of ``detectron2/export/`` (Caffe2Tracer api.py:22,
TracingAdapter flatten.py:186, scripting_with_instances torchscript.py:13) —
TPU-native: ``jax.export`` serialized StableHLO artifacts plus a
flatten/unflatten adapter for the Detections/PanopticOutput pytrees.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import pickle
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class TracingAdapter:
    """Wrap a model fn whose outputs are dataclass pytrees into one whose
    outputs are a flat tuple of arrays (ref export/flatten.py:186).
    ``outputs_schema`` rebuilds the structured output from flat arrays."""

    def __init__(self, fn: Callable):
        self._fn = fn
        self.outputs_schema = None

    def __call__(self, *args):
        out = self._fn(*args)
        flat, treedef = jax.tree_util.tree_flatten(out)
        self.outputs_schema = treedef
        return tuple(flat)

    def unflatten(self, flat: Sequence[Any]):
        assert self.outputs_schema is not None, "call the adapter first"
        return jax.tree_util.tree_unflatten(self.outputs_schema, list(flat))


def export_inference(
    model,
    variables,
    input_shape: Tuple[int, int, int, int],
    path: str,
    combine: bool = True,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> None:
    """Serialize a jitted inference forward as a StableHLO artifact.

    The artifact directory contains:
      model.stablehlo — jax.export serialized function (weights baked in)
      schema.pkl      — output pytree schema for unflattening
    """
    from jax import export as jexport

    b, h, w, c = input_shape

    def fwd(images, sizes):
        out = model.apply(variables, images, sizes, train=False, combine=combine)
        flat, treedef = jax.tree_util.tree_flatten(out)
        return tuple(x for x in flat if x is not None)

    adapter = TracingAdapter(lambda im, sz: model.apply(
        variables, im, sz, train=False, combine=combine
    ))
    images = jax.ShapeDtypeStruct((b, h, w, c), jnp.float32)
    sizes = jax.ShapeDtypeStruct((b, 2), jnp.int32)
    # trace once to capture the schema
    _ = jax.eval_shape(adapter, images, sizes)

    exported = jexport.export(
        jax.jit(adapter), platforms=list(platforms)
    )(images, sizes)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, "schema.pkl"), "wb") as f:
        pickle.dump(
            {"treedef": jax.tree_util.tree_structure(
                jax.eval_shape(lambda im, sz: adapter._fn(im, sz), images, sizes)
            )},
            f,
        )
    logger.info("Exported inference fn to %s", path)


def load_exported(path: str):
    """Load a serialized artifact; returns a callable (images, sizes) ->
    flat output tuple."""
    from jax import export as jexport

    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
