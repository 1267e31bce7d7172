"""Third probe round: the parity-plane conv1 design.

Mosaic probes: leading sublane-split reshape, 3D dim0-contraction, 3D
permutes. XLA probes: cost of emitting the 12 (row-parity × col-parity ×
channel) planes as dense (B,208,208) int8 arrays.
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
    _sync(out if isinstance(out, jnp.ndarray) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out if isinstance(out, jnp.ndarray) else out[0])
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

    # P12: leading sublane-split reshape (416,1248)->(208,2,1248) + slice
    x = jnp.asarray(rng.integers(-127, 127, (416, 1248)), jnp.int8)

    def kp12(x_ref, o_ref):
        v = x_ref[:, :].reshape(208, 2, 1248)
        o_ref[:, :] = v[:, 1, :]

    fp12 = pl.pallas_call(
        kp12, out_shape=jax.ShapeDtypeStruct((208, 1248), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P12 sublane-split reshape", jax.jit(fp12), x,
        expect=np.asarray(x).reshape(208, 2, 1248)[:, 1, :])

    # P13: 3D dim0-contraction (48, M, G) x (48, N) -> (N, M, G)
    S = jnp.asarray(rng.integers(-127, 127, (48, 32, 208)), jnp.int8)
    W = jnp.asarray(rng.integers(-127, 127, (48, 128)), jnp.int8)

    def kp13(s_ref, w_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            w_ref[:, :], s_ref[:, :, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    fp13 = pl.pallas_call(
        kp13, out_shape=jax.ShapeDtypeStruct((128, 32, 208), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P13 3D dim0-contraction", jax.jit(fp13), S, W,
        expect=np.einsum('kn,kmg->nmg', np.asarray(W, np.int32),
                         np.asarray(S, np.int32)))

    # T14: 3D permute (1,2,0): (64, 32, 208) int8 -> (32, 208, 64)
    y = jnp.asarray(rng.integers(-127, 127, (64, 32, 208)), jnp.int8)

    def kt14(y_ref, o_ref):
        o_ref[:, :, :] = jnp.transpose(y_ref[:, :, :], (1, 2, 0))

    ft14 = pl.pallas_call(
        kt14, out_shape=jax.ShapeDtypeStruct((32, 208, 64), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("T14 3D permute(1,2,0)", jax.jit(ft14), y,
        expect=np.transpose(np.asarray(y), (1, 2, 0)))

    # T15: big 2D int8 transpose (416,1248)->(1248,416)
    def kt15(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    ft15 = pl.pallas_call(
        kt15, out_shape=jax.ShapeDtypeStruct((1248, 416), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("T15 big int8 transpose", jax.jit(ft15), x, expect=np.asarray(x).T)

    # ---- XLA: 12 dense parity planes --------------------------------------
    B = 128
    frames = jax.device_put(
        jnp.asarray(rng.random((B, 416, 416, 3)), jnp.bfloat16),
        jax.devices()[0])
    sx_inv = jnp.float32(127.0)

    def q6_(f):
        outs = []
        for p in range(2):
            for q in range(2):
                for c in range(3):
                    sl = jax.lax.slice(f, (0, p, q, c),
                                       (B, 415 + p + 1, 415 + q + 1, c + 1),
                                       (1, 2, 2, 1))[..., 0]
                    outs.append(jnp.clip(
                        jnp.round(sl.astype(jnp.float32) * sx_inv),
                        -127, 127).astype(jnp.int8))
        return jnp.stack(outs, axis=1)          # (B, 12, 208, 208)

    q6 = jax.jit(q6_)
    print(f"Q6 12 planes stack      : {_time_ms(lambda: q6(frames)):8.2f} ms")

    # Q6b: as a tuple of 12 separate dense arrays (no 12-minor anywhere)
    def q6b_(f):
        outs = []
        for p in range(2):
            for q in range(2):
                for c in range(3):
                    sl = jax.lax.slice(f, (0, p, q, c),
                                       (B, 415 + p + 1, 415 + q + 1, c + 1),
                                       (1, 2, 2, 1))[..., 0]
                    outs.append(jnp.clip(
                        jnp.round(sl.astype(jnp.float32) * sx_inv),
                        -127, 127).astype(jnp.int8))
        return tuple(outs)

    q6b = jax.jit(q6b_)
    print(f"Q6b 12 separate planes  : {_time_ms(lambda: q6b(frames)):8.2f} ms")

    # Q7: flat reshape alone (is (B,416,416,3)->(B,416,1248) free?)
    q7 = jax.jit(lambda f: f.reshape(B, 416, 1248) * 1.0)
    print(f"Q7 flat reshape + mul   : {_time_ms(lambda: q7(frames)):8.2f} ms")

    # Q7b: same mul on an array BORN flat
    flat = jax.device_put(
        jnp.asarray(rng.random((B, 416, 1248)), jnp.bfloat16),
        jax.devices()[0])
    q7b = jax.jit(lambda f: f * 1.0)
    print(f"Q7b born-flat mul       : {_time_ms(lambda: q7b(flat)):8.2f} ms")

    # Q8: pallas quantize kernel reading born-flat frames (DMA sanity)
    def kq8(f_ref, o_ref):
        o_ref[:, :] = jnp.clip(
            jnp.round(f_ref[0].astype(jnp.float32) * 127.0),
            -127, 127).astype(jnp.int8)

    fq8 = pl.pallas_call(
        kq8, grid=(B,),
        in_specs=[pl.BlockSpec((1, 416, 1248), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((416, 1248), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((416, 1248), jnp.int8))
    try:
        print(f"Q8 pallas flat quantize : {_time_ms(lambda: fq8(flat)):8.2f} ms")
    except Exception as e:
        print("Q8 FAIL —", str(e).split(chr(10))[0][:140])


if __name__ == "__main__":
    main()
