"""AdaptiveCapacity policy (infer/capacity.py)."""

import numpy as np

from mit_driverless_cv_traininginfra_tpu.infer.capacity import (
    AdaptiveCapacity,
)


def test_warmup_and_floor():
    pol = AdaptiveCapacity(floor=256, quantum=128)
    assert pol.capacity(batch=128, max_det=16) == 256     # warmup
    pol.observe(10)
    assert pol.capacity(batch=128, max_det=16) == 256     # floor


def test_p99_margin_quantised():
    pol = AdaptiveCapacity(floor=256, margin=1.25, quantum=128, window=64)
    rng = np.random.default_rng(0)
    for _ in range(64):
        pol.observe(int(rng.normal(340, 18)))
    cap = pol.capacity(batch=128, max_det=16)
    assert cap % 128 == 0
    # p99 ≈ 340+2.3σ ≈ 382 → ×1.25 ≈ 478 → quantised 512
    assert cap == 512
    # hard cap
    assert pol.capacity(batch=2, max_det=16) == 32


def test_adapts_down_and_up():
    pol = AdaptiveCapacity(floor=128, margin=1.2, quantum=128, window=16)
    for _ in range(16):
        pol.observe(900)
    hi = pol.capacity(128, 16)
    for _ in range(16):
        pol.observe(100)
    lo = pol.capacity(128, 16)
    assert hi >= 1024 and lo == 128


def test_overflow_tracking_and_mask():
    pol = AdaptiveCapacity(floor=128)
    mask = np.zeros((4, 16), bool)
    mask[:, :3] = True
    pol.observe_mask(mask, capacity=8)
    assert pol.loads[-1] == 12
    assert pol.overflows == 1
    pol.observe_mask(mask, capacity=128)
    assert pol.overflows == 1
