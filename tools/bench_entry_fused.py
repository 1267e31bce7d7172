"""Microbench: fused entry path vs current XLA blocks 0-5 (trained weights,
B=128 @ 416², depth-64 chains to defeat the axon dispatch gap)."""

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


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time_ms(fn, iters=32):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) * 1000 / iters


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
        _qconv_q8in, calibrate, quantize_packed_stem, quantize_params,
    )
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
        build_packed_stem, slice_preyolo,
    )
    from mit_driverless_cv_traininginfra_tpu.ops.pallas_entry import (
        conv1_4x4_q8, entry_block_applicable, entry_forward_int8,
        fused_entry_block, quantize_entry,
    )
    from tools.profile_detect import truncated_forward

    batch = 128
    spec = flagship_spec(416)
    assert entry_block_applicable(spec), "flagship spec must be applicable"
    params, state, _, _ = bench_mod._train_synthetic(spec)
    folded = fold_bn(params, state, spec)
    spec, folded = slice_preyolo(spec, folded)
    packed = build_packed_stem(folded)
    rng = np.random.default_rng(42)
    frames_np, _ = yolo_batch(rng, batch, size=416)
    amax = calibrate(spec, folded, jnp.asarray(frames_np[:8], jnp.float32))
    yolo_q = quantize_params(spec, folded, amax)
    stem_q = quantize_packed_stem(packed, amax)
    entry_q = quantize_entry(folded, amax)
    slope = spec.net.leaky_slope

    frames = jax.device_put(jnp.asarray(frames_np, jnp.bfloat16),
                            jax.devices()[0])

    # a) current: blocks 0-5 via packed stem XLA
    a_fn = jax.jit(lambda f: truncated_forward(
        spec, yolo_q, f, 5, packed_stem_q=stem_q))

    # e) fused entry + XLA block 5
    def e_fn_(f):
        resq = entry_forward_int8(entry_q, f, slope)
        return _leaky(_qconv_q8in(resq, yolo_q["5"], 2, 1, jnp.bfloat16),
                      slope)

    e_fn = jax.jit(e_fn_)

    # pieces
    c1_fn = jax.jit(lambda f: conv1_4x4_q8(f, entry_q, slope))
    hq = c1_fn(frames)
    k_fn = jax.jit(lambda h: fused_entry_block(h, entry_q, slope))

    print(f"a current blk0-5     : {_time_ms(lambda: a_fn(frames)):8.2f} ms")
    print(f"e fused blk0-5       : {_time_ms(lambda: e_fn(frames)):8.2f} ms")
    print(f"  c1 4x4s2 (XLA)     : {_time_ms(lambda: c1_fn(frames)):8.2f} ms")
    print(f"  kernel conv2p+res1 : {_time_ms(lambda: k_fn(hq)):8.2f} ms")

    ya = np.asarray(a_fn(frames[:4]), np.float32)
    ye = np.asarray(e_fn(frames[:4]), np.float32)
    d = np.abs(ya - ye)
    rel = d / (np.abs(ya) + 1e-2)
    print("block5-out maxdiff:", float(d.max()),
          " p999 rel:", float(np.quantile(rel, 0.999)),
          " mean|y|:", float(np.abs(ya).mean()))


def xla_variant():
    """e2: 4x4 conv1 + pure-XLA conv2p/res1/block5 (no Pallas)."""
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
        build_packed_stem, slice_preyolo,
    )
    from mit_driverless_cv_traininginfra_tpu.ops.pallas_entry import (
        entry_reference_int8, quantize_entry,
    )
    from tools.profile_detect import truncated_forward

    batch = 128
    spec = flagship_spec(416)
    params, state, _, _ = bench_mod._train_synthetic(spec)
    folded = fold_bn(params, state, spec)
    spec, folded = slice_preyolo(spec, folded)
    packed = build_packed_stem(folded)
    rng = np.random.default_rng(42)
    frames_np, _ = yolo_batch(rng, batch, size=416)
    amax = calibrate(spec, folded, jnp.asarray(frames_np[:8], jnp.float32))
    yolo_q = quantize_params(spec, folded, amax)
    stem_q = quantize_packed_stem(packed, amax)
    entry_q = quantize_entry(folded, amax)
    slope = spec.net.leaky_slope
    frames = jax.device_put(jnp.asarray(frames_np, jnp.bfloat16),
                            jax.devices()[0])

    a_fn = jax.jit(lambda f: truncated_forward(
        spec, yolo_q, f, 5, packed_stem_q=stem_q))

    def e2_(f):
        resq = entry_reference_int8(entry_q, f, slope)
        from mit_driverless_cv_traininginfra_tpu.models.quantize import (
            _qconv_q8in,
        )
        return _leaky(_qconv_q8in(resq, yolo_q["5"], 2, 1, jnp.bfloat16),
                      slope)

    e2 = jax.jit(e2_)
    print(f"a current blk0-5     : {_time_ms(lambda: a_fn(frames)):8.2f} ms")
    print(f"e2 4x4 + XLA rest    : {_time_ms(lambda: e2(frames)):8.2f} ms")
    ya = np.asarray(a_fn(frames[:4]), np.float32)
    ye = np.asarray(e2(frames[:4]), np.float32)
    d = np.abs(ya - ye)
    print("maxdiff:", float(d.max()), " agree:", float((d == 0).mean()))


if "--xla-variant" in sys.argv:
    main = xla_variant


if __name__ == "__main__":
    (xla_variant if "--xla-variant" in sys.argv else main)()
