"""Sixth probe round.

R*: depth-64 re-measures of the short XLA ops (dispatch-gap-corrected).
P15: lane-subrange writes into rank-3 int8 scratch (in-kernel im2col).
P16: rank-3 minor contraction with K=108.
Q16: DMA cost of (1,208,208,12) int8 blocks into a kernel.
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


def _time_ms(fn, iters=64):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) * 1000 / iters


def run(name, fn, *args, expect=None):
    try:
        out = np.asarray(fn(*args))
        if expect is not None:
            ok = np.array_equal(out, np.asarray(expect))
            print(f"{name}: {'PASS' if ok else 'MISMATCH'}")
        else:
            print(f"{name}: PASS (ran)")
    except Exception as e:
        msg = str(e).split('\n')[0][:140]
        print(f"{name}: FAIL — {type(e).__name__}: {msg}")


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("platform:", dev.platform)
    B = 128
    f4 = jax.device_put(jnp.asarray(rng.random((B, 416, 416, 3)),
                                    jnp.bfloat16), dev)
    ff = jax.device_put(jnp.asarray(rng.random((B, 416, 1248)),
                                    jnp.bfloat16), dev)
    sx_inv = jnp.float32(127.0)

    def q8(x):
        return jnp.clip(jnp.round(x.astype(jnp.float32) * sx_inv),
                        -127, 127).astype(jnp.int8)

    r1 = jax.jit(lambda f: f * 2.0)
    print(f"R1 born-flat mul   @64  : {_time_ms(lambda: r1(ff)):8.3f} ms")

    # pack 2x2 + quantize -> (B,208,208,12) int8
    def pack12_(f):
        x = q8(f)
        x = x.reshape(B, 208, 2, 208, 2, 3)
        return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, 208, 208, 12)

    pack12 = jax.jit(pack12_)
    print(f"R2 pack+quant xq12 @64  : {_time_ms(lambda: pack12(f4)):8.3f} ms")

    # quantize 4D frames in place
    r3 = jax.jit(q8)
    print(f"R3 quantize 4D     @64  : {_time_ms(lambda: r3(f4)):8.3f} ms")

    xq12 = pack12(f4)

    # P15: lane-subrange writes at 12-offsets into rank-3 scratch
    def kp15(x_ref, o_ref, scr):
        for s in range(9):
            scr[:, :, 12 * s:12 * s + 12] = x_ref[pl.ds(s, 16), 0:208, :]
        o_ref[:, :, :] = scr[:, :, :]

    x12 = jnp.asarray(rng.integers(-127, 127, (32, 208, 12)), jnp.int8)
    fp15 = pl.pallas_call(
        kp15, out_shape=jax.ShapeDtypeStruct((16, 208, 108), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, 208, 108), jnp.int8)])
    expect = np.concatenate([np.asarray(x12)[s:s + 16, 0:208, :]
                             for s in range(9)], axis=-1)
    run("P15 lane-subrange writes", jax.jit(fp15), x12, expect=expect)

    # P16: rank-3 minor contraction K=108
    S = jnp.asarray(rng.integers(-127, 127, (16, 208, 108)), jnp.int8)
    W = jnp.asarray(rng.integers(-127, 127, (108, 128)), jnp.int8)

    def kp16(s_ref, w_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            s_ref[:, :, :], w_ref[:, :], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    fp16 = pl.pallas_call(
        kp16, out_shape=jax.ShapeDtypeStruct((16, 208, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P16 rank-3 K=108 contract", jax.jit(fp16), S, W,
        expect=np.einsum('mgk,kn->mgn', np.asarray(S, np.int32),
                         np.asarray(W, np.int32)))

    # Q16: DMA of (1,208,208,12) int8 blocks
    def ksum(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(x_ref[0].astype(jnp.float32))

    fq16 = pl.pallas_call(
        ksum, grid=(B,),
        in_specs=[pl.BlockSpec((1, 208, 208, 12), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
    try:
        print(f"Q16 xq12 block DMA @64  : {_time_ms(lambda: fq16(xq12)):8.3f} ms")
    except Exception as e:
        print("Q16 FAIL —", str(e).split(chr(10))[0][:140])

    # Q17: DMA of (1,208,208,128) int8 blocks (reference good layout)
    big = jax.device_put(
        jnp.asarray(rng.integers(-127, 127, (B, 208, 208, 128)), jnp.int8),
        dev)
    fq17 = pl.pallas_call(
        ksum, grid=(B,),
        in_specs=[pl.BlockSpec((1, 208, 208, 128), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
    print(f"Q17 hq128 block DMA@64  : {_time_ms(lambda: fq17(big)):8.3f} ms")


if __name__ == "__main__":
    main()
