"""Definitive h2d-vs-compute overlap probe for the dev tunnel.

The first overlap probe used a 91 ms burn against a 727 ms upload — the
difference between "full overlap" and "upload waits for compute" is one
burn length, lost in noise. Here the burn is calibrated to ~2-3 s so the
two hypotheses differ by seconds:

    serial   ≈ t_burn + t_up
    overlap  ≈ max(t_burn, t_up)

Also probes the reverse order (upload dispatched FIRST, then burn) and
execute-while-upload-in-flight completion, which is the exact shape of
run_batched's steady state (dispatch N+1's upload while N computes).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    up_host = rng.randint(0, 255, (8, 480, 640, 3), np.uint8)  # 7.37 MB

    # generate on device — a 67 MB host upload takes 10+ minutes when the
    # tunnel is in a slow phase and stalls the whole probe
    a = jax.jit(lambda k: jax.random.uniform(k, (4096, 4096)))(
        jax.random.PRNGKey(0))
    a.block_until_ready()

    @jax.jit
    def burn(a, n):
        def body(_, x):
            return x @ a * (1.0 / 64.0)
        return jax.lax.fori_loop(0, n, body, a)[0, 0]

    float(np.asarray(burn(a, 4)))                      # compile
    t0 = time.perf_counter()
    float(np.asarray(burn(a, 64)))
    per64 = time.perf_counter() - t0
    n_burn = max(64, int(64 * 2.0 / per64))            # ~2 s of compute
    t0 = time.perf_counter()
    float(np.asarray(burn(a, n_burn)))
    t_burn = time.perf_counter() - t0
    print(f"burn({n_burn}): {t_burn * 1e3:.0f} ms", flush=True)

    def h2d():
        x = jax.device_put(up_host)
        x.block_until_ready()
        return float(jnp.asarray(x[0, 0, 0, 0], jnp.float32))

    t0 = time.perf_counter()
    h2d()
    t_up = time.perf_counter() - t0
    t0 = time.perf_counter()
    h2d()
    t_up = min(t_up, time.perf_counter() - t0)
    print(f"h2d 7.37MB: {t_up * 1e3:.0f} ms "
          f"({up_host.nbytes / t_up / 1e6:.1f} MB/s)", flush=True)

    # --- A: dispatch burn first, then upload ---------------------------
    r = burn(a, n_burn)
    t0 = time.perf_counter()
    h2d()
    t_up_during = time.perf_counter() - t0
    float(np.asarray(r))
    t_total = time.perf_counter() - t0
    print(f"A: h2d while burn in flight: h2d done at "
          f"{t_up_during * 1e3:.0f} ms, all done at {t_total * 1e3:.0f} ms "
          f"(serial ~{(t_burn + t_up) * 1e3:.0f}, overlap "
          f"~{max(t_burn, t_up) * 1e3:.0f})", flush=True)

    # --- B: dispatch upload first (async), then burn --------------------
    t0 = time.perf_counter()
    x = jax.device_put(up_host)          # async?
    r = burn(a, n_burn)
    s = float(jnp.asarray(x[0, 0, 0, 0], jnp.float32))
    t_mid = time.perf_counter() - t0
    float(np.asarray(r))
    t_total = time.perf_counter() - t0
    print(f"B: upload then burn: upload visible at {t_mid * 1e3:.0f} ms, "
          f"all done at {t_total * 1e3:.0f} ms (serial "
          f"~{(t_burn + t_up) * 1e3:.0f}, overlap ~"
          f"~{max(t_burn, t_up) * 1e3:.0f})", flush=True)

    # --- C: two uploads while burn in flight (run_batched shape) --------
    r = burn(a, n_burn)
    t0 = time.perf_counter()
    h2d()
    h2d()
    t_ups = time.perf_counter() - t0
    float(np.asarray(r))
    t_total = time.perf_counter() - t0
    print(f"C: 2x h2d while burn in flight: uploads done at "
          f"{t_ups * 1e3:.0f} ms, all done at {t_total * 1e3:.0f} ms "
          f"(serial ~{(t_burn + 2 * t_up) * 1e3:.0f}, overlap "
          f"~{max(t_burn, 2 * t_up) * 1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
