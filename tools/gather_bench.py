"""Microbenchmark LUT-sampling strategies on the TPU (one batched session).

The frame's per-pixel passes are dominated by bilinear LUT sampling
(transmittance LUT in the sky integrals, shadow-map PCF, texture atlas) —
all data-dependent gathers, the classic TPU weak spot. This measures, per
sample, the real cost of each formulation:

  g1. fancy-index bilinear gather from a 512x128x3 LUT  (current code path)
  g2. flat 1-D gather (single index per tap)
  g3. one-hot matmul interpolation (MXU; O(table) per sample)
  g4. 2-D Chebyshev evaluation, 10x6 terms/channel (no table at all)
  g5. PCF 5x5 window: 25 fancy-index taps from a 1024^2 map

Usage: python tools/gather_bench.py [n_samples_millions]
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

    if os.environ.get("SZG_GB_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    elif not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    from syzygy_tpu.runtime import accelerator_device

    dev = (
        jax.devices("cpu")[0]
        if os.environ.get("SZG_GB_CPU") == "1"
        else accelerator_device()
    )

    m = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    S = int(m * 1e6)
    S = (S // 1024) * 1024
    H, W = 128, 512  # transmittance LUT dims (v, u)

    rng = np.random.default_rng(0)
    lut_np = rng.random((H, W, 3), np.float32)
    u_np = rng.random(S, np.float32)
    v_np = rng.random(S, np.float32)
    lut = jax.device_put(jnp.asarray(lut_np), dev)
    u = jax.device_put(jnp.asarray(u_np), dev)
    v = jax.device_put(jnp.asarray(v_np), dev)
    shadow = jax.device_put(jnp.asarray(rng.random((1024, 1024), np.float32)), dev)

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    def timed(name, fn, *args, n=6, per=1.0):
        f = jax.jit(fn)
        prev = jnp.zeros((), jnp.float32)
        prev = f(*args, prev)
        for _ in range(2):
            prev = f(*args, prev)
        fetch(prev)  # discard pass: compile + executable upload + warm
        t0 = time.perf_counter()
        for _ in range(n):
            prev = f(*args, prev)
        chk = fetch(prev)
        dt = (time.perf_counter() - t0) / n
        print(
            f"  {name}: {dt * 1000:9.3f} ms -> {dt / per * 1e9:8.2f} ns/sample"
            f" (chk {chk:.3e})",
            flush=True,
        )
        return dt

    print(f"S = {S} samples", flush=True)

    # g1: 2-D fancy-index bilinear (the pattern used all over kernels/)
    def g1(lut, u, v, eps):
        uu = jnp.clip(u + eps * 1e-30, 0.0, 1.0) * (W - 1)
        vv = jnp.clip(v, 0.0, 1.0) * (H - 1)
        x0 = jnp.floor(uu).astype(jnp.int32)
        y0 = jnp.floor(vv).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        fx = (uu - x0)[..., None]
        fy = (vv - y0)[..., None]
        t00 = lut[y0, x0]
        t10 = lut[y0, x1]
        t01 = lut[y1, x0]
        t11 = lut[y1, x1]
        out = (
            t00 * (1 - fx) * (1 - fy)
            + t10 * fx * (1 - fy)
            + t01 * (1 - fx) * fy
            + t11 * fx * fy
        )
        return out.sum() * 1e-30 + eps * 0.0

    timed("g1 bilinear fancy-index", g1, lut, u, v, per=S)

    # g2: flat 1-D gather, nearest (lower bound for one gather op)
    def g2(lut, u, v, eps):
        uu = jnp.clip(u + eps * 1e-30, 0.0, 1.0) * (W - 1)
        vv = jnp.clip(v, 0.0, 1.0) * (H - 1)
        idx = (
            jnp.round(vv).astype(jnp.int32) * W + jnp.round(uu).astype(jnp.int32)
        )
        flat = lut.reshape(-1, 3)
        return flat[idx].sum() * 1e-30 + eps * 0.0

    timed("g2 nearest flat gather ", g2, lut, u, v, per=S)

    # g3: one-hot matmul interp (u-axis matmul after v-axis pair-select)
    def g3(lut, u, v, eps):
        n_s = u.shape[0]
        uu = jnp.clip(u + eps * 1e-30, 0.0, 1.0) * (W - 1)
        vv = jnp.clip(v, 0.0, 1.0) * (H - 1)
        y0 = jnp.floor(vv).astype(jnp.int32)
        fy = (vv - y0)[..., None]
        # v one-hot pair: (n_s, H) @ (H, W*3)
        iy = jax.lax.broadcasted_iota(jnp.int32, (n_s, H), 1)
        wv = jnp.where(iy == y0[:, None], 1.0 - fy, 0.0) + jnp.where(
            iy == jnp.minimum(y0 + 1, H - 1)[:, None], fy, 0.0
        )
        rows = wv.astype(jnp.bfloat16) @ lut.reshape(H, W * 3).astype(
            jnp.bfloat16
        )  # (n_s, W*3)
        rows = rows.reshape(n_s, W, 3)
        x0 = jnp.floor(uu).astype(jnp.int32)
        fx = (uu - x0)[..., None]
        ix = jax.lax.broadcasted_iota(jnp.int32, (n_s, W), 1)
        wu = jnp.where(ix == x0[:, None], 1.0 - fx, 0.0) + jnp.where(
            ix == jnp.minimum(x0 + 1, W - 1)[:, None], fx, 0.0
        )
        out = jnp.einsum("sw,swc->sc", wu.astype(jnp.bfloat16), rows)
        return out.astype(jnp.float32).sum() * 1e-30 + eps * 0.0

    # one-hot at S=2M x H x W would OOM; run on a slice
    S3 = min(S, 65536)
    timed(
        "g3 one-hot matmul      ",
        lambda lut, u, v, eps: g3(lut, u[:S3], v[:S3], eps),
        lut,
        u,
        v,
        per=S3,
    )

    # g4: 2-D Chebyshev eval 10x6 per channel (pure VPU, no table)
    KU, KV = 10, 6
    coef = jax.device_put(
        jnp.asarray(rng.random((KU, KV, 3), np.float32) / (KU * KV)), dev
    )

    def g4(coef, u, v, eps):
        x = (jnp.clip(u + eps * 1e-30, 0.0, 1.0) * 2.0 - 1.0)
        y = jnp.clip(v, 0.0, 1.0) * 2.0 - 1.0

        def cheb(t, k):
            outs = [jnp.ones_like(t), t]
            for _ in range(k - 2):
                outs.append(2.0 * t * outs[-1] - outs[-2])
            return jnp.stack(outs[:k], axis=-1)  # (S, k)

        tu = cheb(x, KU)  # (S, KU)
        tv = cheb(y, KV)  # (S, KV)
        out = jnp.einsum("su,sv,uvc->sc", tu, tv, coef)
        return out.sum() * 1e-30 + eps * 0.0

    timed("g4 chebyshev 10x6      ", g4, coef, u, v, per=S)

    # g5: PCF 5x5 window from a 1024^2 shadow map
    def g5(shadow, u, v, eps):
        uu = jnp.clip(u + eps * 1e-30, 0.0, 1.0) * 1023.0
        vv = jnp.clip(v, 0.0, 1.0) * 1023.0
        x0 = jnp.floor(uu).astype(jnp.int32)
        y0 = jnp.floor(vv).astype(jnp.int32)
        acc = jnp.zeros_like(uu)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                xi = jnp.clip(x0 + dx, 0, 1023)
                yi = jnp.clip(y0 + dy, 0, 1023)
                acc = acc + shadow[yi, xi]
        return acc.sum() * 1e-30 + eps * 0.0

    timed("g5 PCF 25-tap          ", g5, shadow, u, v, per=S * 25)

    # g6: quad-packed bilinear — one gather fetches the 2x2 texel quad
    # (12 contiguous f32), weights applied after. Bitwise-identical texels.
    quad_np = np.zeros((H, W, 12), np.float32)
    quad_np[:, :, 0:3] = lut_np
    quad_np[:, :, 3:6] = lut_np[:, np.minimum(np.arange(W) + 1, W - 1)]
    quad_np[:, :, 6:9] = lut_np[np.minimum(np.arange(H) + 1, H - 1)]
    quad_np[:, :, 9:12] = lut_np[np.minimum(np.arange(H) + 1, H - 1)][
        :, np.minimum(np.arange(W) + 1, W - 1)
    ]
    quad = jax.device_put(jnp.asarray(quad_np.reshape(H * W, 12)), dev)

    def g6(quad, u, v, eps):
        uu = jnp.clip(u + eps * 1e-30, 0.0, 1.0) * (W - 1)
        vv = jnp.clip(v, 0.0, 1.0) * (H - 1)
        x0 = jnp.floor(uu).astype(jnp.int32)
        y0 = jnp.floor(vv).astype(jnp.int32)
        fx = (uu - x0)[..., None]
        fy = (vv - y0)[..., None]
        q = quad[y0 * W + x0]  # (S, 12): one gather
        top = q[:, 0:3] * (1 - fx) + q[:, 3:6] * fx
        bot = q[:, 6:9] * (1 - fx) + q[:, 9:12] * fx
        out = top * (1 - fy) + bot * fy
        return out.sum() * 1e-30 + eps * 0.0

    timed("g6 quad-pack bilinear  ", g6, quad, u, v, per=S)

    # g7: per-lane dynamic gather inside a Pallas kernel (VMEM-resident
    # LUT). Mosaic may not support vector dynamic indexing — probe it.
    try:
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        flat = jax.device_put(
            jnp.asarray(lut_np[:, :, 0].reshape(-1)), dev
        )  # (H*W,)
        BLK = 4096

        def kernel(idx_ref, lut_ref, out_ref):
            idx = idx_ref[:]
            out_ref[:] = lut_ref[idx]

        @jax.jit
        def g7(flat, u, v, eps):
            uu = jnp.clip(u + eps * 1e-30, 0.0, 1.0) * (W - 1)
            vv = jnp.clip(v, 0.0, 1.0) * (H - 1)
            idx = (
                jnp.round(vv).astype(jnp.int32) * W
                + jnp.round(uu).astype(jnp.int32)
            )
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((S,), jnp.float32),
                grid=(S // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (BLK,), lambda i: (i,), memory_space=pltpu.VMEM
                ),
            )(idx, flat)
            return out.sum() * 1e-30 + eps * 0.0

        timed("g7 pallas lane gather  ", g7, flat, u, v, per=S)
    except Exception as e:
        print(f"  g7 pallas lane gather: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    print("gather bench complete", flush=True)


if __name__ == "__main__":
    main()
