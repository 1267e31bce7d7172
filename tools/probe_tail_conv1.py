"""De-risk the rektnet tail kernel: just res4.conv1 (3×3 dilation-2,
64→128) as a per-crop Pallas program in flat pair layout with per-half
K=576 im2col, vs the XLA conv. If this can't beat XLA, the full tail
kernel won't either."""

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

R, P = 84, 42               # padded rows, padded pairs (80×80 crop, ±2 px)
NFLAT = R * P               # 3528
OFF = 2 * P + 1             # first interior flat position (row 2, pair 1)
NSLAB = (81 * P + 40) - OFF + 1   # slab covering all interior positions


def _kernel(x_ref, w_ref, s_ref, b_ref, sx_ref, o_ref, xq_b, tim_b):
    # zero borders once (never written afterwards)
    @pl.when(pl.program_id(0) == 0)
    def _():
        xq_b[:, :] = jnp.zeros_like(xq_b)

    # pad+copy: interior rows of the (80,40,128) input into the 84×42 grid
    for r in range(80):
        xq_b[pl.ds((r + 2) * P + 1, 40), :] = jnp.clip(
            jnp.round(x_ref[0, pl.ds(r * 40, 40), :].astype(jnp.float32)
                      * sx_ref[0, 0]),
            -127, 127).astype(jnp.int8)

    acc = None
    for q in range(2):
        for dy in range(3):
            for dx in range(3):
                s = dy * 3 + dx
                off = OFF + (2 * (dy - 1)) * P + (dx - 1)
                tim_b[:, 64 * s:64 * s + 64] = \
                    xq_b[pl.ds(off, NSLAB), 64 * q:64 * q + 64]
        t = jax.lax.dot_general(
            tim_b[:, :], w_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (t.astype(jnp.float32) * s_ref[0] + b_ref[0])
        yb = y.astype(jnp.bfloat16)
        yb = jnp.where(y >= 0, yb, jnp.zeros_like(yb))   # relu
        o_ref[0, pl.ds(0, NSLAB), 128 * q:128 * q + 128] = yb
    del acc


def tail_conv1(x_pairs_flat, wim, scale, bias, sx_inv):
    C = x_pairs_flat.shape[0]
    return pl.pallas_call(
        _kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 80 * 40, 128), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, NSLAB, 256), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, NSLAB, 256), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((NFLAT, 128), jnp.int8),
            pltpu.VMEM((NSLAB, 576), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x_pairs_flat, wim, scale, bias, sx_inv)


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


def main():
    rng = np.random.default_rng(0)
    C = 512
    h = jnp.asarray(rng.standard_normal((C, 80, 80, 64)) * 0.5, jnp.bfloat16)
    w = rng.standard_normal((3, 3, 64, 128)).astype(np.float32) * 0.1
    s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    sx = 2.0
    scale = jnp.asarray((sx / 127.0) * s_w, jnp.float32).reshape(1, 128)
    bias = jnp.asarray(rng.standard_normal(128) * 0.1,
                       jnp.float32).reshape(1, 128)
    sx_inv = jnp.asarray([[127.0 / sx]], jnp.float32)
    wim = jnp.asarray(wq.reshape(576, 128), jnp.int8)

    # XLA twin
    def xla_(x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / sx)),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, jnp.asarray(wq), (1, 1), [(2, 2), (2, 2)],
            rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * scale[0] + bias[0]
        return jnp.maximum(y.astype(jnp.bfloat16), 0)

    xla = jax.jit(xla_)

    xp = h.reshape(C, 80, 40, 128).reshape(C, 3200, 128)
    k = jax.jit(lambda x: tail_conv1(x, wim, scale, bias, sx_inv))

    print(f"XLA conv1-d2 (512)  : {_time_ms(lambda: xla(h)):8.2f} ms")
    print(f"kernel conv1-d2     : {_time_ms(lambda: k(xp)):8.2f} ms")

    # correctness on 4 crops
    ref = np.asarray(xla(h[:4]), np.float32)        # (4,80,80,128)
    got_fl = np.asarray(k(xp[:4]), np.float32)      # (4,NSLAB,256)
    ok = True
    for c in range(4):
        for (ro, po) in [(0, 0), (40, 20), (79, 39), (3, 38)]:
            pos = (ro + 2) * P + (po + 1) - OFF
            for q in range(2):
                col = 2 * po + q
                g = got_fl[c, pos, 128 * q:128 * q + 128]
                r = ref[c, ro, col, :]
                if not np.allclose(g, r, atol=1e-2):
                    ok = False
    print("correctness spot-check:", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
