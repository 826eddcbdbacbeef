import numpy as np
import jax
import jax.numpy as jnp

from u2seg_tpu.utils.analysis import (
    find_unused_parameters, flop_count, parameter_count,
    parameter_count_table,
)
from u2seg_tpu.utils.env import collect_env_info, seed_all_rng
from u2seg_tpu.utils.memory import retry_if_oom
from u2seg_tpu.utils.tracing import assert_trace_safe, is_tracing


def test_seed_all_rng_reproducible():
    seed_all_rng(42)
    a = np.random.rand(3)
    seed_all_rng(42)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    s = seed_all_rng(None)
    assert 0 <= s < 2 ** 31


def test_collect_env_info():
    info = collect_env_info()
    assert "jax" in info and "devices" in info


def test_parameter_count():
    params = {"a": {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))},
              "c": jnp.zeros((2,))}
    assert parameter_count(params) == 12 + 4 + 2
    table = parameter_count_table(params)
    assert "a" in table


def test_flop_count_matmul():
    a = jnp.zeros((64, 64))
    out = flop_count(lambda x: x @ x, a)
    # 2*N^3 flops for a square matmul
    assert abs(out["flops"] - 2 * 64 ** 3) / (2 * 64 ** 3) < 0.5


def test_find_unused_parameters():
    grads = {"used": jnp.ones((2,)), "unused": jnp.zeros((3,))}
    assert find_unused_parameters(grads) == ["unused"]


def test_retry_if_oom_passthrough():
    @retry_if_oom
    def f(x):
        return x * 2

    assert f(3) == 6

    @retry_if_oom
    def g(x):
        raise ValueError("not oom")

    import pytest

    with pytest.raises(ValueError):
        g(1)


def test_is_tracing():
    assert not is_tracing(jnp.zeros(()))
    seen = []

    @jax.jit
    def f(x):
        seen.append(is_tracing(x))
        return x

    f(jnp.zeros(()))
    assert seen == [True]


def test_assert_trace_safe():
    assert_trace_safe(lambda: True)
    import pytest

    with pytest.raises(AssertionError):
        assert_trace_safe(lambda: False, "boom")

    @jax.jit
    def f(x):
        # abstract comparison would raise; guard swallows it
        assert_trace_safe(lambda: bool(x > 0), "never evaluated")
        return x

    f(jnp.zeros(()))
