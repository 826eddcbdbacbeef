"""Tracing-safety helpers.

Counterpart of ``detectron2/utils/tracing.py`` (is_fx_tracing :30,
assert_fx_safe :45) — the JAX analogue: detect whether a value is an
abstract tracer (inside jit/vmap/grad) and guard host-side assertions so
they only run on concrete values.
"""
from __future__ import annotations

from typing import Any, Callable


def is_tracing(x: Any = None) -> bool:
    """True when called under a jax transformation (or when ``x`` is a
    tracer)."""
    import jax
    import jax.core

    if x is not None:
        return isinstance(x, jax.core.Tracer)
    # no operand: check whether current trace context is concrete
    try:
        import jax.numpy as jnp

        probe = jnp.zeros(())
        return isinstance(probe, jax.core.Tracer)
    except Exception:
        return False


def assert_trace_safe(condition: Callable[[], bool], message: str = "") -> None:
    """Run an assertion only outside tracing (ref assert_fx_safe): inside
    jit the predicate would be abstract and raise a TracerBoolConversion."""
    try:
        ok = condition()
    except Exception:
        return  # abstract value — skip, like the reference's tracing guard
    assert ok, message


def checkify_nan(x, name: str = "value"):
    """Debug helper: jax.debug-print a warning when x contains NaN/Inf
    (usable inside jit; the counterpart of the trainer's host-side NaN
    guard for in-graph debugging)."""
    import jax
    import jax.numpy as jnp

    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.lax.cond(
        bad,
        lambda: jax.debug.print("WARNING: non-finite values in " + name),
        lambda: None,
    )
    return x
