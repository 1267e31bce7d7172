"""Isolate the windowed-DMA failure: which slice form breaks Mosaic?

D1: DMA whole frame by dynamic image index            .at[fidx]
D2: + dynamic row window                              .at[fidx, ds(r0,WIN)]
D3: + dynamic lane window (128-aligned)               .at[fidx, ds, ds]
D4: D2 then dynamic lane slice on the VMEM value
"""

import os
import sys

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

WIN, WINW = 256, 768


def run(name, fn, *args, expect=None):
    try:
        out = np.asarray(fn(*args))
        ok = expect is None or np.array_equal(out, np.asarray(expect))
        print(f"{name}: {'PASS' if ok else 'MISMATCH'}")
    except Exception as e:
        print(f"{name}: FAIL — {str(e).splitlines()[0][:130]}")


def main():
    rng = np.random.default_rng(0)
    print("platform:", jax.devices()[0].platform)
    B, H, WF, C = 8, 416, 1248, 8
    frames = jnp.asarray(rng.random((B, H, WF)), jnp.bfloat16)
    fnp = np.asarray(frames)
    fidx = jnp.asarray(rng.integers(0, B, C), jnp.int32)
    r0 = jnp.asarray(rng.integers(0, H - WIN, C), jnp.int32)
    l0 = jnp.asarray(rng.integers(0, (WF - WINW) // 128, C) * 128, jnp.int32)

    def mk(kernel, out_shape, scratch):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(C,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    out_shape[0], lambda i, *_: (i,) + (0,) * (len(out_shape[0]) - 1),
                    memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (C,) + out_shape[0][1:], jnp.bfloat16))

    # D1: whole frame
    def k1(fi, r, l, f, o, scr, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(f.at[fi[i]], scr, sem)
        dma.start(); dma.wait()
        o[0] = scr[0:64, 0:128]

    f1 = mk(k1, [(1, 64, 128)],
            [pltpu.VMEM((H, WF), jnp.bfloat16), pltpu.SemaphoreType.DMA(())])
    exp1 = np.stack([fnp[int(fidx[i]), 0:64, 0:128] for i in range(C)])
    run("D1 whole-frame DMA", jax.jit(f1), fidx, r0, l0, frames, expect=exp1)

    # D2: row window
    def k2(fi, r, l, f, o, scr, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            f.at[fi[i], pl.ds(r[i], WIN)], scr, sem)
        dma.start(); dma.wait()
        o[0] = scr[0:64, 0:128]

    f2 = mk(k2, [(1, 64, 128)],
            [pltpu.VMEM((WIN, WF), jnp.bfloat16), pltpu.SemaphoreType.DMA(())])
    exp2 = np.stack([fnp[int(fidx[i]), int(r0[i]):int(r0[i]) + 64, 0:128]
                     for i in range(C)])
    run("D2 row-window DMA", jax.jit(f2), fidx, r0, l0, frames, expect=exp2)

    # D3: row+lane window
    def k3(fi, r, l, f, o, scr, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            f.at[fi[i], pl.ds(r[i], WIN), pl.ds(l[i], WINW)], scr, sem)
        dma.start(); dma.wait()
        o[0] = scr[0:64, 0:128]

    f3 = mk(k3, [(1, 64, 128)],
            [pltpu.VMEM((WIN, WINW), jnp.bfloat16),
             pltpu.SemaphoreType.DMA(())])
    exp3 = np.stack([fnp[int(fidx[i]), int(r0[i]):int(r0[i]) + 64,
                         int(l0[i]):int(l0[i]) + 128] for i in range(C)])
    run("D3 row+lane DMA", jax.jit(f3), fidx, r0, l0, frames, expect=exp3)

    # D4: row DMA then dynamic lane slice on the loaded value
    def k4(fi, r, l, f, o, scr, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            f.at[fi[i], pl.ds(r[i], WIN)], scr, sem)
        dma.start(); dma.wait()
        o[0] = scr[0:64, pl.ds(l[i], 128)]

    f4 = mk(k4, [(1, 64, 128)],
            [pltpu.VMEM((WIN, WF), jnp.bfloat16), pltpu.SemaphoreType.DMA(())])
    exp4 = np.stack([fnp[int(fidx[i]), int(r0[i]):int(r0[i]) + 64,
                         int(l0[i]):int(l0[i]) + 128] for i in range(C)])
    run("D4 row DMA + dyn lane slice", jax.jit(f4), fidx, r0, l0, frames,
        expect=exp4)


if __name__ == "__main__":
    main()
