"""Second probe round: transposed-layout building blocks for the fused
entry kernel, plus XLA-side costs of channel-major (NCHW-ish) preprocessing.
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
    # depth 32, not 10: sub-5 ms ops at depth 10 are inflated 2-3 ms by
    # axon dispatch gaps (PERF.md measurement discipline)
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
    print("platform:", jax.devices()[0].platform)

    # T1: in-kernel transpose (128, 208) -> (208, 128), int32 and bf16
    x32 = jnp.asarray(rng.integers(-2**20, 2**20, (128, 208)), jnp.int32)

    def kt1(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    ft1 = pl.pallas_call(
        kt1, out_shape=jax.ShapeDtypeStruct((208, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("T1a transpose int32 (128,208)", jax.jit(ft1), x32,
        expect=np.asarray(x32).T)

    xb = jnp.asarray(rng.standard_normal((64, 208)), jnp.bfloat16)

    def kt1b(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    ft1b = pl.pallas_call(
        kt1b, out_shape=jax.ShapeDtypeStruct((208, 64), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("T1b transpose bf16 (64,208)", jax.jit(ft1b), xb,
        expect=np.asarray(xb).T)

    # T1c: 3D transpose of a band (16, 64, 208) -> (16, 208, 64) bf16
    x3 = jnp.asarray(rng.standard_normal((16, 64, 208)), jnp.bfloat16)

    def kt1c(x_ref, o_ref):
        o_ref[:, :, :] = jnp.transpose(x_ref[:, :, :], (0, 2, 1))

    ft1c = pl.pallas_call(
        kt1c, out_shape=jax.ShapeDtypeStruct((16, 208, 64), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("T1c band transpose bf16", jax.jit(ft1c), x3,
        expect=np.transpose(np.asarray(x3), (0, 2, 1)))

    # P10: dot_general contracting dim0 x dim0 (int8)
    F = jnp.asarray(rng.integers(-127, 127, (48, 208)), jnp.int8)
    W = jnp.asarray(rng.integers(-127, 127, (48, 128)), jnp.int8)

    def kp10(f_ref, w_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            w_ref[:, :], f_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    fp10 = pl.pallas_call(
        kp10, out_shape=jax.ShapeDtypeStruct((128, 208), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P10 dim0-contraction Wt@F", jax.jit(fp10), F, W,
        expect=np.asarray(W, np.int32).T @ np.asarray(F, np.int32))

    # P11: sublane-stack via static row writes into scratch then matmul
    def kp11(f_ref, w_ref, o_ref, scr):
        for i in range(4):
            scr[pl.ds(i * 12, 12), :] = f_ref[pl.ds(i * 12, 12), :]
        o_ref[:, :] = jax.lax.dot_general(
            w_ref[:, :], scr[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    fp11 = pl.pallas_call(
        kp11, out_shape=jax.ShapeDtypeStruct((128, 208), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((48, 208), jnp.int8)])
    run("P11 stack+matmul", jax.jit(fp11), F, W,
        expect=np.asarray(W, np.int32).T @ np.asarray(F, np.int32))

    # ---- XLA-side costs (B=128) -----------------------------------------
    B = 128
    frames = jnp.asarray(rng.random((B, 416, 416, 3)), jnp.bfloat16)
    frames = jax.device_put(frames, jax.devices()[0])
    sx_inv = jnp.float32(127.0)

    def q8(x):
        return jnp.clip(jnp.round(x.astype(jnp.float32) * sx_inv),
                        -127, 127).astype(jnp.int8)

    # Q1: quantize + free reshape to flat rows
    q1 = jax.jit(lambda f: q8(f).reshape(B, 416, 416 * 3))
    print(f"Q1 quant+flat           : {_time_ms(lambda: q1(frames)):8.2f} ms")

    # Q2: quantize + pack 2x2 + channel-major planes (B,12,208,208)
    def q2_(f):
        x = q8(f).reshape(B, 208, 2, 208, 2, 3)
        return jnp.transpose(x, (0, 2, 4, 5, 1, 3)).reshape(B, 12, 208, 208)

    q2 = jax.jit(q2_)
    print(f"Q2 quant+planes NCHW    : {_time_ms(lambda: q2(frames)):8.2f} ms")

    # Q3: conv1p as NCHW conv on the planes (12->128), int8
    wq = jnp.asarray(rng.integers(-127, 127, (3, 3, 12, 128)), jnp.int8)
    planes = q2(frames)

    def q3_(p):
        return jax.lax.conv_general_dilated(
            p, wq, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=jnp.int32)

    q3 = jax.jit(q3_)
    print(f"Q3 conv1p NCHW int8     : {_time_ms(lambda: q3(planes)):8.2f} ms")

    # Q4: 4x4s2 conv NCHW from raw channel planes (B,3,416,416)
    def mkplanes(f):
        return jnp.transpose(q8(f), (0, 3, 1, 2))

    q4a = jax.jit(mkplanes)
    print(f"Q4a quant+NCHW transpose: {_time_ms(lambda: q4a(frames)):8.2f} ms")
    w4 = jnp.asarray(rng.integers(-127, 127, (4, 4, 3, 128)), jnp.int8)
    rp = q4a(frames)

    def q4_(p):
        return jax.lax.conv_general_dilated(
            p, w4, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=jnp.int32)

    q4 = jax.jit(q4_)
    print(f"Q4b 4x4s2 NCHW int8     : {_time_ms(lambda: q4(rp)):8.2f} ms")

    # Q5: DMA efficiency of channel-major planes into a trivial kernel
    def ksum(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(x_ref[:, :, :].astype(jnp.float32))

    fsum = pl.pallas_call(
        ksum, grid=(B,),
        in_specs=[pl.BlockSpec((1, 12, 208, 208), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
    try:
        print(f"Q5 plane DMA+sum kernel : {_time_ms(lambda: fsum(planes)):8.2f} ms")
    except Exception as e:
        print("Q5 FAIL —", str(e).split(chr(10))[0][:140])


if __name__ == "__main__":
    main()
