"""A/B the device RLE encode formulations on the real TPU.

The round-3/4 trail: the double-scatter rle_encode (scatter-max with
duplicate indices) lowers to the SERIAL scalar core when its input is a
computed value (~3.5 ms per 410k map, ~14 ms/img at batch 8 with 4 maps),
even though the same code on parameter inputs takes the vectorized
emitter. Candidates:
  v0  current double-scatter
  v1  scatter-free: searchsorted(cumsum(boundary)) + gathers
  v2  sort-based: sort (masked rank, iota) pairs, slice the run prefix
Inputs are COMPUTED inside the jit (matmul-blurred random ids) to
reproduce the production fusion context. Timing barrier = scalar fetch
(block_until_ready can return early on the tunnel backend).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 8, 640, 640
N = H * W
MAX_RUNS = 16384


def rle_v0(flat, max_runs):
    n = flat.shape[0]
    boundary = flat[1:] != flat[:-1]
    rank = jnp.cumsum(boundary.astype(jnp.int32))
    n_runs = rank[-1] + 1
    dest = jnp.where(boundary, jnp.minimum(rank, max_runs), max_runs)
    starts = jnp.zeros((max_runs + 1,), jnp.int32).at[dest].max(
        jnp.arange(1, n, dtype=jnp.int32))[:max_runs]
    vals = jnp.zeros((max_runs + 1,), jnp.int32).at[dest].max(
        flat[1:].astype(jnp.int32))
    values = jnp.concatenate([flat[:1].astype(jnp.int32), vals[1:max_runs]])
    return starts, values, n_runs


def rle_v1(flat, max_runs):
    n = flat.shape[0]
    boundary = flat[1:] != flat[:-1]
    rank = jnp.cumsum(boundary.astype(jnp.int32))          # (n-1,) 1-based
    n_runs = rank[-1] + 1
    # start of run j>=1 = first position whose rank reaches j; binary
    # search = ~log2(n) vectorized gathers, no scatter anywhere
    j = jnp.arange(1, max_runs, dtype=jnp.int32)
    starts_tail = jnp.searchsorted(rank, j, side="left").astype(jnp.int32) + 1
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), starts_tail])
    starts = jnp.where(jnp.arange(max_runs) < jnp.minimum(n_runs, max_runs),
                       starts, 0)
    values = flat[jnp.minimum(starts, n - 1)].astype(jnp.int32)
    return starts, values, n_runs


def rle_v2(flat, max_runs):
    n = flat.shape[0]
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    rank = jnp.cumsum(boundary.astype(jnp.int32)) - 1       # 0-based run id
    n_runs = rank[-1] + 1
    key = jnp.where(boundary, rank, n).astype(jnp.int32)
    _, starts_full = jax.lax.sort_key_val(
        key, jnp.arange(n, dtype=jnp.int32))
    starts = starts_full[:max_runs]
    ok = jnp.arange(max_runs) < jnp.minimum(n_runs, max_runs)
    starts = jnp.where(ok, starts, 0)
    values = flat[jnp.minimum(starts, n - 1)].astype(jnp.int32)
    return starts, values, n_runs


def make_maps(seed):
    """Computed blobby int maps: ~thousands of runs per image."""
    k = jax.random.PRNGKey(seed)
    base = jax.random.normal(k, (B, H // 40, W // 40, 8))
    up = jax.image.resize(base, (B, H, W, 8), "cubic")
    return jnp.argmax(up, -1).astype(jnp.int32)             # (B, H, W)


def bench(name, fn):
    @jax.jit
    def run(seed):
        maps = make_maps(seed)
        st, vl, nr = jax.vmap(
            lambda m: fn(m.reshape(-1), MAX_RUNS))(maps)
        return st.sum() + vl.sum() + nr.sum()

    _ = float(run(jnp.int32(0)))                            # compile
    tiny = jax.jit(lambda x: x + 1)
    float(np.asarray(tiny(jnp.zeros(()))))
    t0 = time.perf_counter()
    float(np.asarray(tiny(jnp.zeros(()))))
    rtt = time.perf_counter() - t0

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(jnp.int32(i % 3))
    s = float(out)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    print(f"{name}: {dt / iters / B * 1e3:.3f} ms/img "
          f"(checksum {s:.0f})", flush=True)


def check_parity():
    maps = np.asarray(jax.device_get(make_maps(0)))
    for b in range(2):
        flat = jnp.asarray(maps[b].reshape(-1))
        outs = {n: jax.device_get(f(flat, MAX_RUNS))
                for n, f in (("v0", rle_v0), ("v1", rle_v1), ("v2", rle_v2))}
        nr = int(outs["v0"][2])
        assert nr <= MAX_RUNS, nr
        for n in ("v1", "v2"):
            np.testing.assert_array_equal(outs[n][0][:nr], outs["v0"][0][:nr],
                                          err_msg=f"{n} starts")
            np.testing.assert_array_equal(outs[n][1][:nr], outs["v0"][1][:nr],
                                          err_msg=f"{n} values")
            assert int(outs[n][2]) == nr
        print(f"img {b}: parity ok ({nr} runs)", flush=True)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    check_parity()
    # also bench the maps producer alone to subtract it
    bench("maps-only", lambda flat, mr: (flat[:mr], flat[:mr], flat[0]))
    for name, fn in (("v0 double-scatter", rle_v0),
                     ("v1 searchsorted", rle_v1),
                     ("v2 sort", rle_v2)):
        bench(name, fn)
