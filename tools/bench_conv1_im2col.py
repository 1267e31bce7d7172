"""Microbench: conv1 as explicit im2col + int8 matmul (pure XLA).

The 4x4s2 formulation runs at ~8 TOPS through XLA's conv emitter (C_in=3).
Here we build the (B,208,208,48) patch tensor with 16 strided slices +
concat (cheap data movement XLA is good at) and contract with a (48,128)
int8 matmul (MXU-shaped), epilogue fused.
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


# canonical chained timing (utils/profiling.time_ms, depth 32): the old
# local copy chained 10 calls — the depth-10 methodology PERF.md documents
# as inflated 2-3 ms for sub-5 ms stages
from mit_driverless_cv_traininginfra_tpu.utils.profiling import time_ms


def _time_ms(fn, iters=32):
    return time_ms(fn, lambda o: o.astype(jnp.float32), iters)


def main():
    import bench as bench_mod
    from tools.bench_conv1_4x4 import conv1_4x4_weights
    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec,
    )
    from mit_driverless_cv_traininginfra_tpu.data.synthetic import yolo_batch
    from mit_driverless_cv_traininginfra_tpu.models.darknet import fold_bn
    from mit_driverless_cv_traininginfra_tpu.models.quantize import (
        calibrate, quantize_packed_stem, quantize_params,
    )
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
        build_packed_stem, pack_input, slice_preyolo,
    )
    from mit_driverless_cv_traininginfra_tpu.models.quantize import _qconv

    batch = 128
    spec = flagship_spec(416)
    params, state, _, _ = bench_mod._train_synthetic(spec)
    folded = fold_bn(params, state, spec)
    spec, folded = slice_preyolo(spec, folded)
    packed = build_packed_stem(folded)
    rng = np.random.default_rng(42)
    frames_np, _ = yolo_batch(rng, batch, size=416)
    amax = calibrate(spec, folded, jnp.asarray(frames_np[:8], jnp.float32))
    stem_q = quantize_packed_stem(packed, amax)

    w4, b4 = conv1_4x4_weights(folded)
    s_w = np.maximum(np.abs(w4).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    w4q = np.clip(np.round(w4 / s_w), -127, 127).astype(np.int8)
    # (4,4,3,128) -> (48,128) with patch channel order (dy,dx,c)
    wmat = jnp.asarray(w4q.reshape(48, 128), jnp.int8)
    s_x = max(float(amax["0"]), 1e-12) / 127.0
    scale4 = jnp.asarray(s_x * s_w, jnp.float32)
    b4 = jnp.asarray(b4, jnp.float32)
    sx_inv = jnp.float32(1.0 / s_x)
    sx2_inv = stem_q["c2"]["sx_inv"]
    slope = spec.net.leaky_slope

    frames = jax.device_put(jnp.asarray(frames_np, jnp.bfloat16),
                            jax.devices()[0])

    def im2col_fn(f):
        B = f.shape[0]
        xq = jnp.clip(jnp.round(f.astype(jnp.float32) * sx_inv),
                      -127, 127).astype(jnp.int8)
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = []
        for dy in range(4):
            for dx in range(4):
                taps.append(jax.lax.slice(
                    xp, (0, dy, dx, 0), (B, dy + 415, dx + 415, 3),
                    (1, 2, 2, 1)))
        patches = jnp.concatenate(taps, axis=-1)          # (B,208,208,48)
        acc = jax.lax.dot_general(
            patches, wmat, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h = (acc.astype(jnp.float32) * scale4 + b4).astype(jnp.bfloat16)
        h = jnp.where(h >= 0, h, h * slope)
        return jnp.clip(jnp.round(h.astype(jnp.float32) * sx2_inv),
                        -127, 127).astype(jnp.int8)

    v5 = jax.jit(im2col_fn)

    # baseline: the packed-stem conv1 stage as the int8 serving graph runs
    # it, with the same conv2-input requant tail as the im2col variant
    def old_(f):
        h = _qconv(pack_input(f), stem_q["c1"], 1, 1, jnp.bfloat16)
        h = jnp.where(h >= 0, h, h * slope)
        return jnp.clip(jnp.round(h.astype(jnp.float32) * sx2_inv),
                        -127, 127).astype(jnp.int8)

    old = jax.jit(old_)

    print(f"old packed conv1p    : {_time_ms(lambda: old(frames)):8.2f} ms/batch")
    print(f"im2col+matmul int8   : {_time_ms(lambda: v5(frames)):8.2f} ms/batch")

    ha = np.asarray(old(frames[:2]), np.int32)
    hb = np.asarray(v5(frames[:2]), np.int32)
    print("agree frac:", float((ha == hb).mean()),
          "maxdiff:", int(np.abs(ha - hb).max()))


if __name__ == "__main__":
    main()
