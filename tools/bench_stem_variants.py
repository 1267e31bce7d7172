"""Microbench: stem+res1+block5 variants on the live chip.

Variants (all int8 serving math, B=128 @ 416²):
  a) current      — truncated forward through block 5 (packed stem XLA)
  b) int8resident — same region but every conv epilogue emits int8 directly
                    (dequant→leaky→requant fused); block5 emits bf16
  c) conv1p_q8    — packed conv1 alone with fused int8 epilogue (the XLA
                    preamble the planned Pallas kernel needs)
  d) packquant    — space-to-depth pack + input quantize alone

The deltas tell us where the 14.7 ms of 208²-stage time actually goes and
whether XLA fuses requantize epilogues (if b ≪ a, HBM traffic was the
bottleneck and the epilogue fused).
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


# canonical chained timing (utils/profiling.time_ms, default depth 32):
# this tool's old local copy chained only 10 calls, the exact depth-10
# methodology PERF.md documents as inflated 2-3 ms for sub-5 ms stages
from mit_driverless_cv_traininginfra_tpu.utils.profiling import time_ms


def _time_ms(fn, iters=32):
    return time_ms(fn, lambda o: o.astype(jnp.float32), iters)


def main():
    import bench as bench_mod
    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec,
    )
    from mit_driverless_cv_traininginfra_tpu.data.synthetic import yolo_batch
    from mit_driverless_cv_traininginfra_tpu.models.darknet import (
        _leaky, fold_bn,
    )
    from mit_driverless_cv_traininginfra_tpu.models.quantize import (
        _qconv, calibrate, quantize_packed_stem, quantize_params,
    )
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
        build_packed_stem, pack_input, slice_preyolo, stem_is_packable,
    )
    from tools.profile_detect import truncated_forward

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 128

    spec = flagship_spec(416)
    params, state, _, _ = bench_mod._train_synthetic(spec)
    folded = fold_bn(params, state, spec)
    spec, folded = slice_preyolo(spec, folded)
    packed = build_packed_stem(folded)
    rng = np.random.default_rng(42)
    frames_np, _ = yolo_batch(rng, batch, size=416)
    cal = jnp.asarray(frames_np[:8], jnp.float32)
    amax = calibrate(spec, folded, cal)
    yolo_q = quantize_params(spec, folded, amax)
    stem_q = quantize_packed_stem(packed, amax)

    dev = jax.devices()[0]
    frames = jax.device_put(jnp.asarray(frames_np, jnp.bfloat16), dev)
    slope = spec.net.leaky_slope
    print(f"platform={dev.platform} batch={batch}")

    # scales for int8-resident requant epilogues: each conv's OUTPUT requant
    # scale is the NEXT conv's input scale (amax of its input / 127)
    sx = {k: max(float(v), 1e-12) / 127.0 for k, v in amax.items()}

    def q8(x, s_inv):
        return jnp.clip(jnp.round(x.astype(jnp.float32) * s_inv),
                        -127, 127).astype(jnp.int8)

    def iconv(xq, q, stride, padding):
        if isinstance(padding, int):
            padding = [(padding, padding), (padding, padding)]
        return jax.lax.conv_general_dilated(
            xq, q["wq"], (stride, stride), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    # ---- a) current path through block 5 --------------------------------
    a_fn = jax.jit(lambda f: truncated_forward(
        spec, yolo_q, f, 5, packed_stem_q=stem_q))

    # ---- b) int8-resident region ----------------------------------------
    def b_fn_(f):
        xp = pack_input(jnp.asarray(f, jnp.bfloat16))
        xq = q8(xp, stem_q["c1"]["sx_inv"])
        acc = iconv(xq, stem_q["c1"], 1, 1)
        h = _leaky((acc.astype(jnp.float32) * stem_q["c1"]["scale"]
                    + stem_q["c1"]["b"]).astype(jnp.bfloat16), slope)
        hq = q8(h, stem_q["c2"]["sx_inv"])        # int8 written, no bf16 h
        acc = jax.lax.conv_general_dilated(
            hq, stem_q["c2"]["wq"], (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out2 = _leaky((acc.astype(jnp.float32) * stem_q["c2"]["scale"]
                       + stem_q["c2"]["b"]).astype(jnp.bfloat16), slope)
        q2 = yolo_q["2"]
        acc = iconv(q8(out2, q2["sx_inv"]), q2, 1, 0)
        t = _leaky((acc.astype(jnp.float32) * q2["scale"]
                    + q2["b"]).astype(jnp.bfloat16), slope)
        q3 = yolo_q["3"]
        acc = iconv(q8(t, q3["sx_inv"]), q3, 1, 1)
        b3 = (acc.astype(jnp.float32) * q3["scale"]
              + q3["b"]).astype(jnp.bfloat16)
        b3 = _leaky(b3, slope)
        res = b3 + out2
        q5 = yolo_q["5"]
        acc = iconv(q8(res, q5["sx_inv"]), q5, 2, 1)
        return _leaky((acc.astype(jnp.float32) * q5["scale"]
                       + q5["b"]).astype(jnp.bfloat16), slope)

    b_fn = jax.jit(b_fn_)

    # ---- c) conv1p with int8 epilogue ------------------------------------
    def c_fn_(f):
        xp = pack_input(jnp.asarray(f, jnp.bfloat16))
        xq = q8(xp, stem_q["c1"]["sx_inv"])
        acc = iconv(xq, stem_q["c1"], 1, 1)
        h = _leaky((acc.astype(jnp.float32) * stem_q["c1"]["scale"]
                    + stem_q["c1"]["b"]).astype(jnp.bfloat16), slope)
        return q8(h, stem_q["c2"]["sx_inv"])

    c_fn = jax.jit(c_fn_)

    # ---- d) pack+quant alone ---------------------------------------------
    d_fn = jax.jit(lambda f: q8(pack_input(jnp.asarray(f, jnp.bfloat16)),
                                stem_q["c1"]["sx_inv"]))

    for name, fn in [("a_current_blk0-5", a_fn), ("b_int8resident", b_fn),
                     ("c_conv1p_q8", c_fn), ("d_packquant", d_fn)]:
        ms = _time_ms(lambda fn=fn: fn(frames))
        print(f"{name:<20} {ms:8.2f} ms/batch  {ms / batch:8.4f} ms/frame")

    # sanity: b ≈ a numerically (quantized shortcut add differs slightly)
    ya = np.asarray(a_fn(frames[:2]), np.float32)
    yb = np.asarray(b_fn(frames[:2]), np.float32)
    print("max|a-b|:", float(np.max(np.abs(ya - yb))),
          "rel:", float(np.max(np.abs(ya - yb) / (np.abs(ya) + 1e-3))))


if __name__ == "__main__":
    main()
