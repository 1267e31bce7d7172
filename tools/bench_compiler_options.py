"""XLA-TPU compiler-options sweep on the int8 serving programs (round 4+).

``jax.jit``'s per-compile ``compiler_options`` propagate through the axon
remote-compile tunnel to the real TPU XLA compiler (probed this round: a
bogus option name is rejected by ``tpu_compile_helper`` with HTTP 500,
while real TPU flags compile and run).  That unlocks a lever never tried
in rounds 1-3 — re-scheduling the layout-bound conv1 / detect / RektNet
graphs with XLA TPU knobs — without any code change and without needing
``XLA_FLAGS`` (whose env would not cross the tunnel).

Accepted-by-the-remote-compiler knobs probed so far: scoped_vmem_limit_kib,
enable_latency_hiding_scheduler, licm_size_inflation_ratio, rwb_fusion,
dot_dot_fusion(_duplicated), enable_multi_level_nested_loop_fusion,
memory_bound_loop_optimizer_options, prefer_latch_optimized_rhs_layouts.

Usage:
  python tools/bench_compiler_options.py [--target conv1|detect|keypoint|pipeline|all]
      [--iters 32] [--batch 128] [--capacity 416]
      [--opt name:k=v[,k=v...]]        # extra config(s) to try, repeatable

Measures each option-set against the no-options baseline, chained-fence
timing (utils.profiling.time_ms, PERF.md measurement discipline). Run on
a QUIET host — concurrent CPU load inflates dispatch gaps.
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

from mit_driverless_cv_traininginfra_tpu.utils.profiling import time_ms

# Option sets for the per-stage sweep. Values are strings — the PJRT
# compile-options env parser wants text. Baseline MUST stay first.
SWEEP = [
    ("baseline", {}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("licm2", {"xla_tpu_licm_size_inflation_ratio": "2"}),
    ("mlnlf", {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
    ("ddf_dup", {"xla_tpu_dot_dot_fusion_duplicated": "true"}),
    ("latch_rhs", {"xla_tpu_prefer_latch_optimized_rhs_layouts": "false"}),
]


def _arg(flag, default, cast=str):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv \
        else default


def _extra_opts():
    """--opt name:k=v,k=v (repeatable) → [(name, {k: v})]."""
    out = []
    for i, a in enumerate(sys.argv):
        if a == "--opt":
            spec = sys.argv[i + 1]
            name, _, kvs = spec.partition(":")
            opts = dict(kv.split("=", 1) for kv in kvs.split(",") if kv)
            out.append((name, opts))
    return out


def _compile(jitted, opts, *args, **kwargs):
    return jitted.lower(*args, **kwargs).compile(compiler_options=opts or None)


def main():
    import bench as bench_mod
    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec,
    )
    from mit_driverless_cv_traininginfra_tpu.data.synthetic import (
        rektnet_batch, yolo_batch,
    )
    from mit_driverless_cv_traininginfra_tpu.infer.pipeline import (
        _postprocess, two_stage_pipeline_int8,
    )
    from mit_driverless_cv_traininginfra_tpu.models.darknet import fold_bn
    from mit_driverless_cv_traininginfra_tpu.models import rektnet
    from mit_driverless_cv_traininginfra_tpu.models.quantize import (
        apply_rektnet_int8, calibrate, calibrate_rektnet, detections_int8,
        quantize_packed_stem, quantize_params, quantize_rektnet_params,
    )
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
        build_packed_stem, slice_preyolo,
    )
    from mit_driverless_cv_traininginfra_tpu.ops.pallas_entry import (
        conv1_4x4_q8, entry_block_applicable, quantize_entry,
    )

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print("not on TPU — numbers would be meaningless; exiting")
        return

    target = _arg("--target", "all")
    iters = _arg("--iters", 32, int)
    batch = _arg("--batch", 128, int)
    capacity = _arg("--capacity", 416, int)
    max_det = 16
    conf_thresh = 0.8

    # identical setup to bench.py's int8 path (cached trained weights)
    spec = flagship_spec(416)
    params, state, rp, rs = bench_mod._train_synthetic(spec)
    folded = fold_bn(params, state, spec)
    spec, folded = slice_preyolo(spec, folded)
    packed = build_packed_stem(folded)
    rp = rektnet.fold_bn(rp, rs)

    rng = np.random.default_rng(42)
    frames_np, _ = yolo_batch(rng, batch, size=416)
    cal = jnp.asarray(frames_np[:8], jnp.float32)
    amax = calibrate(spec, folded, cal)
    yolo_q = quantize_params(spec, folded, amax)
    stem_q = quantize_packed_stem(packed, amax)
    crops_cal, _ = rektnet_batch(np.random.default_rng(3), 32)
    rekt_q = quantize_rektnet_params(
        rp, calibrate_rektnet(rp, jnp.asarray(crops_cal)))
    assert entry_block_applicable(spec)
    entry_q = quantize_entry(folded, amax)
    slope = spec.net.leaky_slope

    frames = jax.device_put(jnp.asarray(frames_np, jnp.bfloat16), dev)

    # crop buffer for the keypoint target (same flow as bench's breakdown)
    det_jit = jax.jit(lambda f: detections_int8(
        spec, yolo_q, f, packed_stem_q=stem_q, with_classes=False,
        entry_q=entry_q))
    post_jit = jax.jit(lambda d: _postprocess(d, conf_thresh, 0.25, max_det))
    dets = det_jit(frames)
    boxes, scores, mask = post_jit(dets)
    key = jnp.where(mask.reshape(-1), -scores.reshape(-1), jnp.inf)
    sel = jax.lax.top_k(-key, capacity)[1]
    boxes_c = boxes.reshape(-1, 4)[sel]
    fidx = (sel // max_det).astype(jnp.int32)
    from mit_driverless_cv_traininginfra_tpu.ops.pallas_crop import (
        roi_crop_windowed,
    )
    flat = jax.jit(
        lambda f, b, i: roi_crop_windowed(f, b, i, 80, 80))(
            frames, boxes_c, fidx)

    configs = SWEEP + _extra_opts()
    # --configs a,b,c: restrict to named sets (baseline always kept first)
    # — full-pipeline compiles through the tunnel cost minutes EACH.
    if "--configs" in sys.argv:
        keep = set(sys.argv[sys.argv.index("--configs") + 1].split(","))
        configs = [c for c in configs if c[0] == "baseline" or c[0] in keep]

    def sweep(name, jitted, fence, *args, **kwargs):
        print(f"\n== {name} (B={batch}, iters={iters}) ==")
        base = None
        for cname, opts in configs:
            try:
                c = _compile(jitted, opts, *args, **kwargs)
            except Exception as e:
                print(f"  {cname:12s}:  COMPILE FAIL "
                      f"({type(e).__name__}: {str(e)[:80]})")
                continue
            ms = time_ms(lambda: c(*args, **kwargs), fence, iters)
            if base is None:
                base = ms
            print(f"  {cname:12s}: {ms:8.3f} ms/batch "
                  f"({ms / base:5.3f}x baseline)")

    if target in ("conv1", "all"):
        sweep("conv1 4x4/s2 int8 (layout-bound stage)",
              jax.jit(lambda f: conv1_4x4_q8(f, entry_q, slope)),
              lambda o: o.astype(jnp.float32)[..., 0], frames)

    if target in ("detect", "all"):
        sweep("detect int8 (backbone + heads + decode)",
              det_jit, lambda o: o[..., 4], frames)

    if target in ("keypoint", "all"):
        sweep(f"keypoint int8 ({capacity} crops)",
              jax.jit(lambda c: apply_rektnet_int8(rekt_q, c)[1]),
              lambda o: o[..., 0], flat)

    if target in ("pipeline", "all"):
        # Close over the static args (spec, thresholds, capacity): an AOT
        # Compiled object must be called with exactly the lowered arrays,
        # not the jit wrapper's static kwargs.
        pipe = jax.jit(lambda yq, sq, rq, f, eq: two_stage_pipeline_int8(
            spec, yq, sq, rq, f, conf_thresh=conf_thresh, nms_thresh=0.25,
            max_det=max_det, crop_capacity=capacity, entry_q=eq,
            crop_kernel=True))
        sweep("fused two_stage_pipeline_int8",
              pipe, lambda o: (o.keypoints, o.scores),
              yolo_q, stem_q, rekt_q, frames, entry_q)


if __name__ == "__main__":
    main()
