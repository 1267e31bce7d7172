"""Probe Mosaic lowering support for the fused-entry-kernel building blocks.

Each probe is a tiny pallas_call compiled + executed on the live backend and
checked against the XLA equivalent. Prints PASS/FAIL per probe so the kernel
design can commit to supported idioms only.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args, expect=None, atol=0):
    try:
        out = np.asarray(fn(*args))
        if expect is not None:
            ok = np.allclose(out, np.asarray(expect), atol=atol)
            print(f"{name}: {'PASS' if ok else 'MISMATCH'} "
                  f"(maxdiff {np.max(np.abs(out - np.asarray(expect)))})")
        else:
            print(f"{name}: PASS (ran)")
    except Exception as e:
        msg = str(e).split('\n')[0][:160]
        print(f"{name}: FAIL — {type(e).__name__}: {msg}")


def main():
    rng = np.random.default_rng(0)
    print("platform:", jax.devices()[0].platform)

    # P1: 3D dot_general (rows, W, K) x (K, N), int8 -> int32
    x = jnp.asarray(rng.integers(-127, 127, (17, 208, 64)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 127, (64, 128)), jnp.int8)

    def k1(x_ref, w_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            x_ref[:, :, :], w_ref[:, :],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    f1 = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((17, 208, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    exp1 = jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    run("P1 3D dot_general int8", jax.jit(f1), x, w, expect=exp1)

    # P2a: strided lax.slice on leading dim (17,...) stride 2
    def k2a(x_ref, o_ref):
        o_ref[:, :, :] = jax.lax.slice(x_ref[:, :, :], (0, 0, 0),
                                       (15, 208, 64), (2, 1, 1))

    f2a = pl.pallas_call(
        k2a, out_shape=jax.ShapeDtypeStruct((8, 208, 64), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P2a strided slice dim0", jax.jit(f2a), x, expect=np.asarray(x)[0:15:2])

    # P2b: strided lax.slice on 2nd-minor (sublane) dim
    def k2b(x_ref, o_ref):
        o_ref[:, :, :] = jax.lax.slice(x_ref[:, :, :], (0, 0, 0),
                                       (17, 207, 64), (1, 2, 1))

    f2b = pl.pallas_call(
        k2b, out_shape=jax.ShapeDtypeStruct((17, 104, 64), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P2b strided slice sublane", jax.jit(f2b), x,
        expect=np.asarray(x)[:, 0:207:2])

    # P3: reshape (17,208,64) -> (17,104,128) (pair-merge into lanes)
    def k3(x_ref, o_ref):
        o_ref[:, :, :] = x_ref[:, :, :].reshape(17, 104, 128)

    f3 = pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((17, 104, 128), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P3 pair-merge reshape", jax.jit(f3), x,
        expect=np.asarray(x).reshape(17, 104, 128))

    # P4: dynamic pl.ds read+write on scratch, inside fori_loop with @pl.when
    y = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)

    def k4(x_ref, o_ref, scr):
        def body(i, c):
            scr[pl.ds(i * 8, 8), :] = x_ref[pl.ds(i * 8, 8), :] * 2.0

            @pl.when(i == 7)
            def _():
                o_ref[:, :] = scr[:, :]
            return c
        jax.lax.fori_loop(0, 8, body, 0)

    f4 = pl.pallas_call(
        k4, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((64, 128), jnp.float32)])
    run("P4 dyn ds + when in fori", jax.jit(f4), y, expect=np.asarray(y) * 2)

    # P5: int8 matmul with K=32 and K=108 (non-128 contraction)
    a = jnp.asarray(rng.integers(-127, 127, (256, 32)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 127, (32, 64)), jnp.int8)

    def k5(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                              preferred_element_type=jnp.int32)

    f5 = pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((256, 64), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P5 int8 matmul K=32", jax.jit(f5), a, b,
        expect=np.asarray(a, np.int32) @ np.asarray(b, np.int32))

    # P6: lane-offset static slice [64:128] on int8 value
    def k6(x_ref, o_ref):
        o_ref[:, :, :] = x_ref[:, :, 32:64]

    f6 = pl.pallas_call(
        k6, out_shape=jax.ShapeDtypeStruct((17, 208, 32), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P6 lane-offset slice", jax.jit(f6), x, expect=np.asarray(x)[:, :, 32:])

    # P7: f32 scale row (1,N) broadcast-multiply int32 (rows,W,N)
    s = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)

    def k7(x_ref, s_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[:, :, :], w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:, :, :] = (acc.astype(jnp.float32)
                          * s_ref[0]).astype(jnp.bfloat16)

    f7 = pl.pallas_call(
        k7, out_shape=jax.ShapeDtypeStruct((17, 208, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    run("P7 epilogue broadcast", jax.jit(f7), x, s,
        expect=(np.asarray(exp1, np.float32)
                * np.asarray(s)).astype(jnp.bfloat16), atol=1e-2)


if __name__ == "__main__":
    main()
