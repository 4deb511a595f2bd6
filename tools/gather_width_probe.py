"""Gather cost vs table ROW COUNT and CHANNEL WIDTH (one device session).

Motivated by the skyview_tseg A/B (r4): adding 12 channels to the 2M-row
skyview LUT's gather made the frame ~4 ms SLOWER even though it removed two
512x128-table gathers — so "a gather costs ~10 ms/frame at 1080p" cannot be
table-independent. This measures a 2M-sample gather (one 1080p frame's
worth) from tables of {64k, 2M} rows x {4, 12, 24, 48} f32 channels, plus a
tiny 1k-row table (the proposed per-row t_seg side table).

Usage: python tools/gather_width_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu_session import wait_healthy  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("SZG_GW_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    elif not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    from syzygy_tpu.runtime import accelerator_device

    dev = (
        jax.devices("cpu")[0]
        if os.environ.get("SZG_GW_CPU") == "1"
        else accelerator_device()
    )

    S = 2_073_600  # one 1080p frame of samples
    REPS = 10
    rng = np.random.default_rng(0)
    idx_host = rng.integers(0, 1 << 30, S, dtype=np.int64)

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    for rows in (1_024, 65_536, 2_097_152):
        for ch in (4, 12, 24, 48):
            table = jax.device_put(
                jnp.asarray(rng.random((rows, ch), np.float32)), dev
            )
            idx = jax.device_put(
                jnp.asarray((idx_host % rows).astype(np.int32)), dev
            )

            @jax.jit
            def run(t, ix, s0):
                # chain REPS dependent gathers (index perturbed by the
                # previous sum so nothing folds), force with one scalar
                def body(c, _):
                    s, ix = c
                    g = t[ix]
                    s = s + g.sum() * 1e-12
                    ix = (ix + jnp.int32(s * 0) + 1) % t.shape[0]
                    return (s, ix), None

                (s, _), _ = jax.lax.scan(
                    body, (s0, ix), None, length=REPS
                )
                return s

            # discard pass: lazy executable upload + warm-up
            fetch(run(table, idx, jnp.float32(0.0)))
            t0 = time.perf_counter()
            fetch(run(table, idx, jnp.float32(1e-6)))
            dt = time.perf_counter() - t0
            ms_per_gather = dt / REPS * 1e3
            ns_per_row = dt / REPS / S * 1e9
            print(
                f"rows={rows:>9,} ch={ch:>2}: {ms_per_gather:7.2f} ms per "
                f"2M-sample gather ({ns_per_row:6.2f} ns/row)",
                flush=True,
            )


if __name__ == "__main__":
    main()
