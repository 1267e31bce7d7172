"""Production serving wrapper: fused pipeline + adaptive crop capacity.

The reference deploys the two stages as separate TensorRT engines with
host-side crop plumbing (README.md:59); here serving is one compiled XLA
program per (batch, capacity) bucket, and this wrapper owns the pieces a
server process needs around it:

- the int8 (or bf16) parameter bundles,
- the AdaptiveCapacity policy (p99-margin crop capacity, quantised so jit
  recompiles are one-off per bucket),
- periodic load observation (a single device→host scalar every
  ``observe_every`` batches — off the hot path).

Usage::

    server = TwoStageServer.from_params(spec, yolo_q, stem_q, rekt_q,
                                        entry_q=entry_q, conf_thresh=0.8)
    out = server(frames)          # PipelineOut; recompiles only on a new
                                  # (batch, capacity) bucket
"""

from __future__ import annotations

from typing import Optional

from mit_driverless_cv_traininginfra_tpu.infer.capacity import (
    AdaptiveCapacity,
)
from mit_driverless_cv_traininginfra_tpu.infer.pipeline import (
    PipelineOut,
    two_stage_pipeline,
    two_stage_pipeline_int8,
)


class TwoStageServer:
    """Callable serving frontend over the fused detect→crop→keypoints
    pipeline with policy-driven crop capacity."""

    def __init__(self, spec, *, yolo_q=None, stem_q=None, rekt_q=None,
                 entry_q=None, yolo_params=None, rekt_params=None,
                 packed_stem=None, conf_thresh: float = 0.8,
                 nms_thresh: float = 0.25, max_det: int = 16,
                 crop_size: int = 80,
                 policy: Optional[AdaptiveCapacity] = None,
                 observe_every: int = 8):
        if (yolo_q is None) == (yolo_params is None):
            raise ValueError("pass exactly one of yolo_q (int8) or "
                             "yolo_params (bf16/f32 folded)")
        self.spec = spec
        self.yolo_q, self.stem_q, self.rekt_q = yolo_q, stem_q, rekt_q
        self.entry_q = entry_q
        self.yolo_params, self.rekt_params = yolo_params, rekt_params
        self.packed_stem = packed_stem
        self.conf_thresh = conf_thresh
        self.nms_thresh = nms_thresh
        self.max_det = max_det
        self.crop_size = crop_size
        self.policy = policy or AdaptiveCapacity()
        self.observe_every = max(1, observe_every)
        self.calls = 0
        self.current_capacity: Optional[int] = None

    @classmethod
    def from_params(cls, spec, yolo_q, stem_q, rekt_q, **kw):
        return cls(spec, yolo_q=yolo_q, stem_q=stem_q, rekt_q=rekt_q, **kw)

    def __call__(self, frames) -> PipelineOut:
        B = frames.shape[0]
        cap = self.policy.capacity(B, self.max_det)
        self.current_capacity = cap
        if self.yolo_q is not None:
            out = two_stage_pipeline_int8(
                self.spec, self.yolo_q, self.stem_q, self.rekt_q, frames,
                conf_thresh=self.conf_thresh, nms_thresh=self.nms_thresh,
                max_det=self.max_det, crop_size=self.crop_size,
                crop_capacity=cap, entry_q=self.entry_q)
        else:
            out = two_stage_pipeline(
                self.spec, self.yolo_params, {}, self.rekt_params, {},
                frames, conf_thresh=self.conf_thresh,
                nms_thresh=self.nms_thresh, max_det=self.max_det,
                crop_size=self.crop_size, packed_stem=self.packed_stem,
                crop_capacity=cap)
        self.calls += 1
        if self.calls % self.observe_every == 0 or len(self.policy.loads) == 0:
            self.policy.observe_mask(out.mask, cap)
        return out
