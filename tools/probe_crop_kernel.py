"""Probe the windowed-crop kernel building blocks:
(i) PrefetchScalarGridSpec with a manual 2-dynamic-start DMA from HBM;
(ii) iota-built structured column-resample matmul (RxB);
(iii) per-program overhead at grid=512.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mit_driverless_cv_traininginfra_tpu.utils.jaxcache import (
    enable_compile_cache,
)

enable_compile_cache()

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time_ms(fn, iters=32):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) * 1000 / iters


WIN, WINW = 256, 768   # window rows, window lanes (256 cols x 3)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("platform:", dev.platform)
    B, H, WF = 16, 416, 1248
    C = 64
    frames = jax.device_put(jnp.asarray(rng.random((B, H, WF)), jnp.bfloat16),
                            dev)
    fidx = jnp.asarray(rng.integers(0, B, C), jnp.int32)
    r0 = jnp.asarray(rng.integers(0, H - WIN, C), jnp.int32)
    l0 = jnp.asarray((rng.integers(0, (WF - WINW) // 128, C) * 128),
                     jnp.int32)

    # P20: scalar-prefetch + manual windowed DMA, copy window to output
    def kcopy(fidx_ref, r0_ref, l0_ref, f_hbm, o_ref, win, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            f_hbm.at[fidx_ref[i], pl.ds(r0_ref[i], WIN),
                     pl.ds(l0_ref[i], WINW)],
            win, sem)
        dma.start()
        dma.wait()
        o_ref[0] = win[:, :]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(C,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, WIN, WINW), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WIN, WINW), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
    )
    fcopy = pl.pallas_call(
        kcopy, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((C, WIN, WINW), jnp.bfloat16))
    try:
        got = np.asarray(fcopy(fidx, r0, l0, frames))
        ref = np.stack([
            np.asarray(frames)[int(fidx[i]), int(r0[i]):int(r0[i]) + WIN,
                               int(l0[i]):int(l0[i]) + WINW]
            for i in range(C)])
        print("P20 windowed DMA:", "PASS" if np.array_equal(got, ref)
              else "MISMATCH")
    except Exception as e:
        print("P20 FAIL —", str(e).split(chr(10))[0][:160])
        return

    # P21: structured column matmul: out (80,240) from win rows (80,WINW)
    # RxB[l, m] = hat(sx[m//3] - (l//3)) * (l%3 == m%3)
    sx = jnp.asarray(rng.uniform(5, 250, (C, 80)), jnp.float32)  # window cols

    def kresample(fidx_ref, r0_ref, l0_ref, f_hbm, sx_ref, o_ref, win, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            f_hbm.at[fidx_ref[i], pl.ds(r0_ref[i], WIN),
                     pl.ds(l0_ref[i], WINW)],
            win, sem)
        dma.start()
        dma.wait()
        li = jax.lax.broadcasted_iota(jnp.int32, (WINW, 240), 0)
        mi = jax.lax.broadcasted_iota(jnp.int32, (WINW, 240), 1)
        w_src = (li // 3).astype(jnp.float32)
        sxm = sx_ref[0, mi // 3]
        hat = jnp.clip(1.0 - jnp.abs(sxm - w_src), 0.0, 1.0)
        rxb = jnp.where(li % 3 == mi % 3, hat, 0.0).astype(jnp.bfloat16)
        rows = win[0:80, :]                       # fake row pass
        o_ref[0] = jnp.dot(rows, rxb, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    gs2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(C,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, 80), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 80, 240), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WIN, WINW), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
    )
    fres = pl.pallas_call(
        kresample, grid_spec=gs2,
        out_shape=jax.ShapeDtypeStruct((C, 80, 240), jnp.bfloat16))
    try:
        got = np.asarray(fres(fidx, r0, l0, frames, sx), np.float32)
        # oracle
        fr = np.asarray(frames, np.float32)
        ok = True
        for i in range(4):
            w0 = fr[int(fidx[i]), int(r0[i]):int(r0[i]) + WIN,
                    int(l0[i]):int(l0[i]) + WINW]
            rows = w0[0:80]
            wc = rows.reshape(80, WINW // 3, 3)
            sxi = np.asarray(sx)[i]
            hat = np.clip(1 - np.abs(sxi[:, None]
                                     - np.arange(WINW // 3)[None, :]), 0, 1)
            ref = np.einsum('jw,iwc->ijc', hat, wc).reshape(80, 240)
            if not np.allclose(got[i], ref, atol=0.15, rtol=0.05):
                ok = False
        print("P21 structured resample:", "PASS" if ok else "MISMATCH")
    except Exception as e:
        print("P21 FAIL —", str(e).split(chr(10))[0][:160])
        return

    # P22: timing at grid=512
    C2 = 512
    fidx2 = jnp.asarray(rng.integers(0, B, C2), jnp.int32)
    r02 = jnp.asarray(rng.integers(0, H - WIN, C2), jnp.int32)
    l02 = jnp.asarray(rng.integers(0, (WF - WINW) // 128, C2) * 128,
                      jnp.int32)
    sx2 = jnp.asarray(rng.uniform(5, 250, (C2, 80)), jnp.float32)
    fres2 = pl.pallas_call(
        kresample,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(C2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec((1, 80), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 80, 240), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((WIN, WINW), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((C2, 80, 240), jnp.bfloat16))
    print(f"P22 512 crops windowed  : "
          f"{_time_ms(lambda: fres2(fidx2, r02, l02, frames, sx2)):8.3f} ms")

    from mit_driverless_cv_traininginfra_tpu.ops.image import (
        roi_crop_bilinear_indexed,
    )

    frames4 = jax.device_put(
        jnp.asarray(rng.random((B, H, 416, 3)), jnp.bfloat16), dev)
    boxes = jnp.asarray(
        np.stack([rng.uniform(10, 200, C2), rng.uniform(10, 200, C2),
                  rng.uniform(210, 400, C2), rng.uniform(210, 400, C2)],
                 axis=1), jnp.float32)
    # jit over ARGUMENTS: a zero-arg closure bakes the inputs in as
    # constants and XLA can fold the whole gather at compile time,
    # leaving a dispatch-only "measurement"
    f_cur = jax.jit(lambda fr, bx, fi: roi_crop_bilinear_indexed(
        fr, bx, fi, 80, 80))
    print(f"P22 current indexed crop: "
          f"{_time_ms(lambda: f_cur(frames4, boxes, fidx2)):8.3f} ms")


if __name__ == "__main__":
    main()
