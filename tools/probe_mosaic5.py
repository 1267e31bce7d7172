"""Fifth probe round: locate the frame-ingest tax and test channel-padded
conv1 variants.

Q7  reshape 4D->flat + mul      (tax on touching born-4D frames?)
Q7b born-flat mul               (baseline: clean layout)
Q7c born-4D mul                 (is the 4D layout itself slow?)
Q8  pallas kernel reading born-flat frames (DMA sanity + quantize)
Q9  4x4s2 int8 chain from born-flat (reshape to 4D inside jit)
Q11 4x4s2 int8 with channels zero-padded 3->8 and 3->16 at quantize time
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


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("platform:", dev.platform)
    B = 128
    f4 = jax.device_put(jnp.asarray(rng.random((B, 416, 416, 3)),
                                    jnp.bfloat16), dev)
    ff = jax.device_put(jnp.asarray(rng.random((B, 416, 1248)),
                                    jnp.bfloat16), dev)

    q7 = jax.jit(lambda f: f.reshape(B, 416, 1248) * 2.0)
    q7b = jax.jit(lambda f: f * 2.0)
    q7c = jax.jit(lambda f: f * 2.0)
    print(f"Q7  4D->flat reshape+mul: {_time_ms(lambda: q7(f4)):8.2f} ms")
    print(f"Q7b born-flat mul       : {_time_ms(lambda: q7b(ff)):8.2f} ms")
    print(f"Q7c born-4D mul         : {_time_ms(lambda: q7c(f4)):8.2f} ms")

    def kq8(f_ref, o_ref):
        o_ref[0] = jnp.clip(
            jnp.round(f_ref[0].astype(jnp.float32) * 127.0),
            -127, 127).astype(jnp.int8)

    fq8 = pl.pallas_call(
        kq8, grid=(B,),
        in_specs=[pl.BlockSpec((1, 416, 1248), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 416, 1248), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 416, 1248), jnp.int8))
    try:
        print(f"Q8  pallas flat quantize: {_time_ms(lambda: jax.jit(fq8)(ff)):8.2f} ms")
    except Exception as e:
        print("Q8 FAIL —", str(e).split(chr(10))[0][:140])

    # conv1 4x4s2 variants
    w4 = jnp.asarray(rng.integers(-127, 127, (4, 4, 3, 128)), jnp.int8)

    def chain(x4):
        xq = jnp.clip(jnp.round(x4.astype(jnp.float32) * 127.0),
                      -127, 127).astype(jnp.int8)
        return jax.lax.conv_general_dilated(
            xq, w4, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    q9 = jax.jit(lambda f: chain(f.reshape(B, 416, 416, 3)))
    print(f"Q9  4x4s2 from born-flat: {_time_ms(lambda: q9(ff)):8.2f} ms")
    q10 = jax.jit(chain)
    print(f"Q10 4x4s2 from born-4D  : {_time_ms(lambda: q10(f4)):8.2f} ms")

    for cpad in (8, 16, 32):
        wp = jnp.zeros((4, 4, cpad, 128), jnp.int8).at[:, :, :3].set(w4)

        def chain_pad(x4, wp=wp, cpad=cpad):
            xq = jnp.clip(jnp.round(x4.astype(jnp.float32) * 127.0),
                          -127, 127).astype(jnp.int8)
            xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, cpad - 3)))
            return jax.lax.conv_general_dilated(
                xq, wp, (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        qp = jax.jit(chain_pad)
        print(f"Q11 4x4s2 cpad={cpad:<3}     : {_time_ms(lambda: qp(f4)):8.2f} ms")


if __name__ == "__main__":
    main()
