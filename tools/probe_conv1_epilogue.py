"""Diagnose WHERE conv1's 5 ms goes: conv vs epilogue vs store (round 4).

probe_conv1_packed.py showed even a pure 1×1 int8 conv 48→128 at 208²
(pre-packed input, zero layout excuse) costs 4.5 ms/batch — ~15 int8
TOPS and ~220 GB/s, far below both ceilings. The analytic traffic floor
for the stage (133 MB frame read + 708 MB hq write) is ~1 ms. Hypothesis:
the dequant→leaky→requant epilogue does not fuse into the conv and
materializes wide intermediates (an f32 copy of the 208²×128 activation
is 2.8 GB/batch → ~3.5 ms on its own).

Variants on the SAME (B,208,208,48) int8 input / (48,128) weights:

  full_epi     int32 conv → f32 scale+bias → bf16 leaky → f32 round →
               int8   (the serving epilogue; baseline)
  cast_only    int32 conv → astype(int8)              (no f32 math)
  bf16_epi     int32 conv → everything in bf16         (precision loss
               bounded by bf16 mantissa on the int32 acc)
  no_round     full epilogue minus the round()         (is round the
               unfusable op?)
  f32_out      int32 conv → f32 scale+bias, f32 OUT    (writes 2.8 GB —
               calibrates what a materialized f32 tensor costs)
  int32_out    raw conv, int32 OUT                     (2.8 GB write)

Usage: python tools/probe_conv1_epilogue.py [--batch 128] [--iters 64]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit_driverless_cv_traininginfra_tpu.utils.jaxcache import (
    enable_compile_cache,
)

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mit_driverless_cv_traininginfra_tpu.utils.profiling import time_ms


def _arg(flag, default, cast=str):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv \
        else default


def main():
    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print("not on TPU — numbers would be meaningless; exiting")
        return
    B = _arg("--batch", 128, int)
    iters = _arg("--iters", 64, int)
    Ho = 208
    rng = np.random.default_rng(0)
    x48 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (B, Ho, Ho, 48), np.int8)), dev)
    w48 = jnp.asarray(
        rng.integers(-127, 128, (1, 1, 48, 128)).astype(np.int8))
    scale = jnp.asarray(rng.random(128, np.float32) * 1e-3)
    bias = jnp.asarray(rng.random(128, np.float32))
    slope = 0.1
    sx_inv = jnp.float32(37.2)

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, w48, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def full_epi(x):
        h = (conv(x).astype(jnp.float32) * scale + bias).astype(jnp.bfloat16)
        h = jnp.where(h >= 0, h, h * slope)
        return jnp.clip(jnp.round(h.astype(jnp.float32) * sx_inv),
                        -127, 127).astype(jnp.int8)

    def cast_only(x):
        return conv(x).astype(jnp.int8)

    def bf16_epi(x):
        h = (conv(x).astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
             + bias.astype(jnp.bfloat16))
        h = jnp.where(h >= 0, h, h * jnp.bfloat16(slope))
        return jnp.clip(jnp.round(h * jnp.bfloat16(37.2)),
                        -127, 127).astype(jnp.int8)

    def no_round(x):
        h = (conv(x).astype(jnp.float32) * scale + bias).astype(jnp.bfloat16)
        h = jnp.where(h >= 0, h, h * slope)
        return jnp.clip(h.astype(jnp.float32) * sx_inv,
                        -127, 127).astype(jnp.int8)

    def f32_out(x):
        return conv(x).astype(jnp.float32) * scale + bias

    def int32_out(x):
        return conv(x)

    fence = lambda o: o.astype(jnp.float32)[..., 0]
    runs = [("full_epi ", full_epi), ("cast_only", cast_only),
            ("bf16_epi ", bf16_epi), ("no_round ", no_round),
            ("f32_out  ", f32_out), ("int32_out", int32_out)]
    print(f"== conv1 epilogue probe (B={B}, iters={iters}, input 208²×48 int8) ==")
    base = None
    for name, fn in runs:
        jf = jax.jit(fn)
        ms = time_ms(lambda: jf(x48), fence, iters)
        if base is None:
            base = ms
        print(f"  {name}: {ms:8.3f} ms/batch ({ms / base:5.3f}x)")


if __name__ == "__main__":
    main()
