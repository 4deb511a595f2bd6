"""Gather probe round 2: tier boundary, index coherence, f16 tables.

Follow-ups to tools/gather_width_probe.py (r4 session: 1k rows = 3.8
ns/row; 64k = 12; 2M width-bound 23-53 ns/row):

  a. where between 1k and 64k rows the cheap tier ends (4k/8k/16k/32k,
     12ch) — informs shrinking the 64k-row transmittance LUT;
  b. coherent (pixel-smooth) vs random indices at 64k/2M rows — the frame's
     gathers are mostly coherent, and in-frame PCF costs ~5x less than the
     random-index probe predicts;
  c. f16 and bf16 2M-row tables — if the wide-table cost is bytes-bound,
     halving bytes should halve it (candidate: skyview quad in f16).

Usage: python tools/gather_width_probe2.py
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

    S = 2_073_600
    REPS = 10
    rng = np.random.default_rng(0)
    rand_idx = rng.integers(0, 1 << 30, S, dtype=np.int64)
    # coherent: a 1080p raster scan of a smoothly varying field + jitter,
    # like LUT/texture coords in the frame (neighbors hit nearby rows)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, 1080, dtype=np.float32),
        np.linspace(0, 1, 1920, dtype=np.float32),
        indexing="ij",
    )
    field = 0.5 + 0.3 * np.sin(3 * xx + 1) * np.cos(2 * yy) + 0.2 * yy
    coh = field.reshape(-1)[:S]

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    def measure(rows, ch, idx_host, dtype, label):
        table = jax.device_put(
            jnp.asarray(rng.random((rows, ch)).astype(dtype)), dev
        )
        idx = jax.device_put(jnp.asarray(idx_host.astype(np.int32)), dev)

        @jax.jit
        def run(t, ix, s0):
            def body(c, _):
                s, ix = c
                g = t[ix]
                s = s + g.astype(jnp.float32).sum() * 1e-12
                ix = (ix + jnp.int32(s * 0) + 1) % t.shape[0]
                return (s, ix), None

            (s, _), _ = jax.lax.scan(body, (s0, ix), None, length=REPS)
            return s

        fetch(run(table, idx, jnp.float32(0.0)))
        t0 = time.perf_counter()
        fetch(run(table, idx, jnp.float32(1e-6)))
        dt = time.perf_counter() - t0
        print(
            f"{label}: {dt / REPS * 1e3:7.2f} ms per 2M-sample gather "
            f"({dt / REPS / S * 1e9:6.2f} ns/row)",
            flush=True,
        )

    # a. tier boundary (random indices, 12ch f32)
    for rows in (2_048, 4_096, 8_192, 16_384, 32_768):
        measure(
            rows, 12, rand_idx % rows, np.float32,
            f"a rows={rows:>7,} ch=12 rand f32",
        )
    # b. coherence
    for rows in (65_536, 2_097_152):
        measure(
            rows, 12, (coh * (rows - 1)).astype(np.int64), np.float32,
            f"b rows={rows:>9,} ch=12 COHERENT f32",
        )
    # c. dtype at 2M rows
    for dtype, name in ((np.float16, "f16"), (np.dtype("bfloat16"), "bf16")):
        try:
            measure(
                2_097_152, 12, rand_idx % 2_097_152, dtype,
                f"c rows=2,097,152 ch=12 rand {name}",
            )
        except Exception as e:
            print(f"c {name}: failed {type(e).__name__}: {str(e)[:80]}")
    measure(
        2_097_152, 24, rand_idx % 2_097_152, np.float16,
        "c rows=2,097,152 ch=24 rand f16",
    )


if __name__ == "__main__":
    main()
