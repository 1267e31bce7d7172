"""Fourth probe round: the NHWC-ordered dim0-contraction (conv1 crux) and
the fixed 12-plane XLA prep cost."""

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
    if isinstance(out, (tuple, list)):
        out = out[0]
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out if not isinstance(out, (tuple, list)) else out[0])
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

    S = jnp.asarray(rng.integers(-127, 127, (48, 16, 208)), jnp.int8)
    W = jnp.asarray(rng.integers(-127, 127, (48, 128)), jnp.int8)
    exp = np.einsum('kmg,kn->mgn', np.asarray(S, np.int32),
                    np.asarray(W, np.int32))

    # P13b: dot_general(S (48,M,G), W (48,N)) -> (M,G,N)
    def kp13b(s_ref, w_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            s_ref[:, :, :], w_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    fp13b = pl.pallas_call(
        kp13b, out_shape=jax.ShapeDtypeStruct((16, 208, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P13b dim0-contract (M,G,N)", jax.jit(fp13b), S, W, expect=exp)

    # P13c: same via in-kernel jnp.stack of 48 2D slices from one plane
    plane = jnp.asarray(rng.integers(-127, 127, (208, 208)), jnp.int8)

    def kp13c(p_ref, w_ref, o_ref):
        sl = [p_ref[pl.ds(k % 4, 16), pl.ds(0, 208)] for k in range(48)]
        st = jnp.stack(sl, axis=0)
        o_ref[:, :, :] = jax.lax.dot_general(
            st, w_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    fp13c = pl.pallas_call(
        kp13c, out_shape=jax.ShapeDtypeStruct((16, 208, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    expc = np.einsum('kmg,kn->mgn',
                     np.stack([np.asarray(plane, np.int32)[k % 4:k % 4 + 16]
                               for k in range(48)]),
                     np.asarray(W, np.int32))
    run("P13c stack-slices+contract", jax.jit(fp13c), plane, W, expect=expc)

    # ---- XLA: 12 dense parity planes (fixed limits) -----------------------
    B = 128
    frames = jax.device_put(
        jnp.asarray(rng.random((B, 416, 416, 3)), jnp.bfloat16),
        jax.devices()[0])
    sx_inv = jnp.float32(127.0)

    def planes_(f):
        outs = []
        for p in range(2):
            for q in range(2):
                for c in range(3):
                    sl = jax.lax.slice(f, (0, p, q, c), (B, 416, 416, c + 1),
                                       (1, 2, 2, 1))[..., 0]
                    outs.append(jnp.clip(
                        jnp.round(sl.astype(jnp.float32) * sx_inv),
                        -127, 127).astype(jnp.int8))
        return tuple(outs)

    q6b = jax.jit(planes_)
    print(f"Q6b 12 separate planes  : {_time_ms(lambda: q6b(frames)):8.2f} ms")

    # Q6c: planes from a BORN-FLAT frames array (B,416,1248)
    flat = jax.device_put(
        jnp.asarray(rng.random((B, 416, 1248)), jnp.bfloat16),
        jax.devices()[0])

    def planes_flat_(f):
        outs = []
        for p in range(2):
            for q in range(2):
                for c in range(3):
                    sl = jax.lax.slice(f, (0, p, 3 * q + c),
                                       (B, 416, 1248), (1, 2, 6))
                    outs.append(jnp.clip(
                        jnp.round(sl.astype(jnp.float32) * sx_inv),
                        -127, 127).astype(jnp.int8))
        return tuple(outs)

    q6c = jax.jit(planes_flat_)
    print(f"Q6c planes from flat    : {_time_ms(lambda: q6c(flat)):8.2f} ms")

    # Q6d: single fused op: strided-slice into a (B,208,208,12) NHWC-narrow
    def planes_nhwc_(f):
        outs = []
        for p in range(2):
            for q in range(2):
                for c in range(3):
                    outs.append(jax.lax.slice(
                        f, (0, p, q, c), (B, 416, 416, c + 1),
                        (1, 2, 2, 1))[..., 0])
        x = jnp.stack(outs, axis=-1)
        return jnp.clip(jnp.round(x.astype(jnp.float32) * sx_inv),
                        -127, 127).astype(jnp.int8)

    q6d = jax.jit(planes_nhwc_)
    print(f"Q6d NHWC-12 pack        : {_time_ms(lambda: q6d(frames)):8.2f} ms")


if __name__ == "__main__":
    main()
