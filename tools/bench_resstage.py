"""Microbench: fused 26²-stage Pallas kernel vs XLA (trained weights,
B=128, depth-32 chains)."""

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
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) * 1000 / iters


def main():
    import bench as bench_mod
    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec,
    )
    from mit_driverless_cv_traininginfra_tpu.data.synthetic import yolo_batch
    from mit_driverless_cv_traininginfra_tpu.models.darknet import fold_bn
    from mit_driverless_cv_traininginfra_tpu.models.quantize import (
        calibrate, quantize_packed_stem, quantize_params,
    )
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
        build_packed_stem, slice_preyolo,
    )
    from mit_driverless_cv_traininginfra_tpu.ops.pallas_resstage import (
        fused_res_stage, quantize_res_stage, res_stage_post, res_stage_pre,
        res_stage_reference, res_stage_spans, stage_mask,
    )
    from tools.profile_detect import truncated_forward

    batch = 128
    spec = flagship_spec(416)
    spans = res_stage_spans(spec)
    print("res-stage spans (start, n, C):", spans)
    params, state, _, _ = bench_mod._train_synthetic(spec)
    folded = fold_bn(params, state, spec)
    spec, folded = slice_preyolo(spec, folded)
    packed = build_packed_stem(folded)
    rng = np.random.default_rng(42)
    frames_np, _ = yolo_batch(rng, batch, size=416)
    amax = calibrate(spec, folded, jnp.asarray(frames_np[:8], jnp.float32))
    yolo_q = quantize_params(spec, folded, amax)
    stem_q = quantize_packed_stem(packed, amax)
    slope = spec.net.leaky_slope

    frames = jax.device_put(jnp.asarray(frames_np, jnp.bfloat16),
                            jax.devices()[0])

    # the 26² stage: first 1x1 at block 38 per the flagship layout
    start, nb, C = next(s for s in spans if s[2] == 512)
    next_conv = start + 3 * nb      # the stride-2 conv consuming the stage
    print(f"stage: start={start} n={nb} C={C} next_conv={next_conv}")
    rs = quantize_res_stage(yolo_q, start, nb, next_conv)

    # input activation: output of block start-1 (the s2 conv)
    x_fn = jax.jit(lambda f: truncated_forward(
        spec, yolo_q, f, start - 1, packed_stem_q=stem_q))
    x37 = x_fn(frames)
    S = x37.shape[1]
    print("stage input:", x37.shape, x37.dtype)

    ref_fn = jax.jit(lambda x: res_stage_reference(x, rs, nb, slope))
    print(f"XLA stage             : {_time_ms(lambda: ref_fn(x37)):8.2f} ms")

    xflat = jax.jit(res_stage_pre)(x37)
    for G in (4, 8, 16):
        mask = stage_mask(S, G)
        k_fn = jax.jit(lambda xf, m=mask, G=G: fused_res_stage(
            xf, m, rs, S=S, G=G, n_blocks=nb, leaky_slope=slope))
        try:
            ms = _time_ms(lambda: k_fn(xflat))
            print(f"kernel G={G:<3}          : {ms:8.2f} ms")
        except Exception as e:
            print(f"kernel G={G}: FAIL — {str(e).splitlines()[0][:120]}")

    # correctness at G=8
    mask = stage_mask(S, 8)
    yq, ybf = fused_res_stage(xflat, mask, rs, S=S, G=8, n_blocks=nb,
                              leaky_slope=slope)
    xr, yr = ref_fn(x37)
    yq4 = np.asarray(res_stage_post(yq, batch, S))[:, 1:S + 1, 1:S + 1, :]
    ybf4 = np.asarray(res_stage_post(ybf, batch, S),
                      np.float32)[:, 1:S + 1, 1:S + 1, :]
    yr = np.asarray(yr, np.int32)
    xr = np.asarray(xr, np.float32)
    print("yq agree:", float((yq4.astype(np.int32) == yr).mean()),
          "maxdiff:", int(np.abs(yq4.astype(np.int32) - yr).max()))
    print("ybf maxdiff:", float(np.abs(ybf4 - xr).max()),
          "mean|x|:", float(np.abs(xr).mean()))


if __name__ == "__main__":
    main()
