"""Bound the packed-wire-format lever for conv1 (round 4).

conv1 (the 4×4/s2 conv 3→128, ops/pallas_entry.build_conv1_4x4) is the
last layout-bound stage in the serving graph: 5.2-5.7 ms/batch at ~12-13
int8 TOPS, untouched by every in-graph escape (PERF.md entry-block
campaign) AND by the XLA compiler-options sweep. All of those pay the
device-side cost of touching a ≤12-channel tensor. This probe asks a
different question: if the WIRE/STAGING layout changes — the host
letterboxes every frame anyway, writing each output pixel exactly once,
so it can emit any fixed relayout for free — what does conv1 cost when
the device never sees a 3-channel tensor?

Variants (all produce hq-shaped (B,208,208,128) int8; random data — this
bounds the TIME, exactness is the integration step's job):

  cur_int8      current serving path: frames (B,416,416,3) bf16 →
                quantize → int8 4×4/s2 conv → requant  (baseline)
  im2col48      input pre-im2col (B,208,208,48) int8 (4× wire bytes;
                stride-2 4×4 taps → k=(dy*4+dx)*3+c) → 1×1 conv = pure
                MXU matmul → requant
  im2col48_mm   same input, explicit dot_general on (B·208·208, 48)
  s2d12         input space-to-depth (B,208,208,12) int8 (SAME wire
                bytes as the raw frame) → 3×3/s1 conv 12→128 (dense
                form of the 4×4/s2 conv; 2.25× the MACs, structural
                zeros) → requant
  s2d12_pad32   s2d12 zero-padded to 32 channels on host (2.67× wire)
                → 3×3/s1 conv 32→128

Usage: python tools/probe_conv1_packed.py [--batch 128] [--iters 64]
Run on a QUIET host (PERF.md measurement discipline).
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


def _requant_epilogue(acc, scale, b, slope, sx_inv):
    h = (acc.astype(jnp.float32) * scale + b).astype(jnp.bfloat16)
    h = jnp.where(h >= 0, h, h * slope)
    return jnp.clip(jnp.round(h.astype(jnp.float32) * sx_inv),
                    -127, 127).astype(jnp.int8)


def main():
    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print("not on TPU — numbers would be meaningless; exiting")
        return
    B = _arg("--batch", 128, int)
    iters = _arg("--iters", 64, int)
    H = 416
    Ho = H // 2
    slope = 0.1
    rng = np.random.default_rng(0)

    frames = jax.device_put(
        jnp.asarray(rng.random((B, H, H, 3), np.float32), jnp.bfloat16), dev)
    x48 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (B, Ho, Ho, 48), np.int8)), dev)
    x12 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (B, Ho, Ho, 12), np.int8)), dev)
    x32 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (B, Ho, Ho, 32), np.int8)), dev)

    w4 = rng.standard_normal((4, 4, 3, 128), np.float32)
    wq4 = jnp.asarray(np.clip(np.round(w4 * 20), -127, 127), jnp.int8)
    w48 = jnp.asarray(np.asarray(wq4).reshape(48, 128))          # k-major
    w12 = jnp.asarray(np.clip(rng.integers(-127, 128,
                                           (3, 3, 12, 128)), -127, 127),
                      jnp.int8)
    w32 = jnp.asarray(np.clip(rng.integers(-127, 128,
                                           (3, 3, 32, 128)), -127, 127),
                      jnp.int8)
    scale = jnp.asarray(rng.random(128, np.float32) * 1e-3)
    bias = jnp.asarray(rng.random(128, np.float32))
    sx_inv = jnp.float32(37.2)

    def cur_int8(f):
        xq = jnp.clip(jnp.round(f.astype(jnp.float32) * 127.0),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, wq4, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return _requant_epilogue(acc, scale, bias, slope, sx_inv)

    def im2col48(x):
        acc = jax.lax.conv_general_dilated(
            x, w48.reshape(1, 1, 48, 128), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return _requant_epilogue(acc, scale, bias, slope, sx_inv)

    def im2col48_mm(x):
        acc = jax.lax.dot_general(
            x.reshape(-1, 48), w48,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return _requant_epilogue(acc, scale, bias, slope,
                                 sx_inv).reshape(B, Ho, Ho, 128)

    def s2d12(x):
        acc = jax.lax.conv_general_dilated(
            x, w12, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return _requant_epilogue(acc, scale, bias, slope, sx_inv)

    def s2d12_pad32(x):
        acc = jax.lax.conv_general_dilated(
            x, w32, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return _requant_epilogue(acc, scale, bias, slope, sx_inv)

    fence = lambda o: o.astype(jnp.float32)[..., 0]
    runs = [
        ("cur_int8 (416,3) baseline", cur_int8, frames),
        ("im2col48 (208,48) 1x1conv", im2col48, x48),
        ("im2col48 dot_general     ", im2col48_mm, x48),
        ("s2d12 (208,12) 3x3conv   ", s2d12, x12),
        ("s2d12_pad32 (208,32) 3x3 ", s2d12_pad32, x32),
    ]
    print(f"== conv1 wire-layout probe (B={B}, iters={iters}) ==")
    base = None
    for name, fn, x in runs:
        jf = jax.jit(fn)
        ms = time_ms(lambda: jf(x), fence, iters)
        if base is None:
            base = ms
        print(f"  {name}: {ms:8.3f} ms/batch ({ms / base:5.3f}x baseline, "
              f"{ms / B:6.4f} ms/frame)")


if __name__ == "__main__":
    main()
