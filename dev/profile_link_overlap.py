"""Characterize the dev-tunnel link: bandwidths, their VARIANCE, and
whether h2d uploads, d2h fetches, and device compute can overlap each
other — the answer decides the e2e pipelining design (max(link, device)
vs sum).

All timings use wall clock around genuinely-blocking host calls
(device_get / np.asarray); block_until_ready can return early here.
Every d2h probe fetches an array that has NEVER been fetched before:
jax caches the host copy of an unmodified device array, so re-fetching
the same array measures a memcpy, not the link (an earlier revision of
this script fell for exactly that, reporting 3.6 ms for 7.4 MB).
"""
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

MB = 1e6


def timed(label, f):
    t0 = time.perf_counter()
    out = f()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt * 1e3:.1f} ms", flush=True)
    return out, dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    up = rng.randint(0, 255, (8, 480, 640, 3), np.uint8)  # 7.37 MB
    nbytes_up = up.nbytes

    # a compute of known duration: chained matmuls
    a = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))

    @jax.jit
    def burn(a, n):
        def body(_, x):
            return x @ a * (1.0 / 64.0)
        return jax.lax.fori_loop(0, n, body, a)[0, 0]

    float(np.asarray(burn(a, 4)))                      # compile
    t0 = time.perf_counter()
    float(np.asarray(burn(a, 64)))
    t_burn = time.perf_counter() - t0
    print(f"burn(64): {t_burn * 1e3:.1f} ms", flush=True)

    # device-resident arrays for d2h probes, one per fetch, never fetched.
    # vary the content (+i) so no host-copy cache can alias them.
    fresh = [(jax.device_put(up) + np.uint8(i)) for i in range(6)]
    for x in fresh:
        x.block_until_ready()
    fetch_i = iter(range(len(fresh)))

    def d2h():
        return np.asarray(fresh[next(fetch_i)]).sum()

    # --- h2d alone (blocking: force materialization via tiny use) -------
    def h2d():
        x = jax.device_put(up)
        x.block_until_ready()
        # force: fetch 1 byte derived from the array so the transfer is done
        return float(jnp.asarray(x[0, 0, 0, 0], jnp.float32))

    ups = []
    for k in range(3):
        _, t_up = timed(f"h2d 7.37MB [{k}]", h2d)
        ups.append(t_up)
    t_up = min(ups)
    print(f"  -> h2d best {nbytes_up / t_up / MB:.1f} MB/s, worst "
          f"{nbytes_up / max(ups) / MB:.1f} MB/s", flush=True)

    downs = []
    for k in range(2):
        _, t_down = timed(f"d2h 7.37MB [{k}]", d2h)
        downs.append(t_down)
    t_down = min(downs)
    print(f"  -> d2h best {nbytes_up / t_down / MB:.1f} MB/s, worst "
          f"{nbytes_up / max(downs) / MB:.1f} MB/s", flush=True)

    # --- compute then upload: does h2d wait for the queued compute? -----
    def compute_then_up():
        r = burn(a, 64)                                # enqueue ~t_burn
        t0 = time.perf_counter()
        h2d()
        t_mid = time.perf_counter() - t0
        float(np.asarray(r))
        return t_mid

    t_mid = compute_then_up()
    print(f"h2d issued while burn(64) in flight: {t_mid * 1e3:.1f} ms "
          f"(serial would be ~{(t_burn + t_up) * 1e3:.0f}, overlapped "
          f"~{max(t_burn, t_up) * 1e3:.0f})", flush=True)

    # --- compute then fetch of an UNRELATED never-fetched array ----------
    def compute_then_down():
        r = burn(a, 64)
        t0 = time.perf_counter()
        d2h()
        t_mid = time.perf_counter() - t0
        float(np.asarray(r))
        return t_mid

    t_mid = compute_then_down()
    print(f"d2h of ready array while burn(64) in flight: "
          f"{t_mid * 1e3:.1f} ms (serial ~{(t_burn + t_down) * 1e3:.0f}, "
          f"overlapped ~{max(t_burn, t_down) * 1e3:.0f})", flush=True)

    # --- h2d + d2h from two threads (full duplex?) -----------------------
    pool = ThreadPoolExecutor(2)
    t0 = time.perf_counter()
    f1 = pool.submit(h2d)
    f2 = pool.submit(d2h)
    f1.result(); f2.result()
    t_both = time.perf_counter() - t0
    print(f"h2d || d2h: {t_both * 1e3:.1f} ms (serial "
          f"~{(t_up + t_down) * 1e3:.0f}, duplex ~"
          f"{max(t_up, t_down) * 1e3:.0f})", flush=True)
    pool.shutdown()


if __name__ == "__main__":
    main()
