"""Tracing / profiling utilities (SURVEY.md §5: the reference has only
wall-clock accumulation in the train loop, train.py:53,77-79; the TPU-native
equivalent is ``jax.profiler`` traces plus host-side step timing kept off
the hot path).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory (XLA ops, HBM usage, ICI traffic).
- :class:`StepTimer` — EMA step timing with deferred device syncs: it fences
  on a tiny device→host read only every ``sync_every`` steps, so the
  dispatch queue stays full between measurements (the per-step ``.item()``
  sync in the reference's loop is exactly what this avoids).
- :func:`device_memory_stats` — per-device HBM live/peak bytes.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "outputs/profile"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def fence(*outs) -> float:
    """Device→host scalar read over ``outs`` — the ONLY reliable execution
    fence on this toolchain (``block_until_ready`` is a no-op through the
    axon tunnel; CLAUDE.md measurement rules). Returns the summed scalar so
    callers can also use it as a cheap nan/activity probe."""
    import jax.numpy as jnp

    return sum(float(jnp.sum(o)) for o in outs)


def time_ms(fn, fence_fn, iters: int = 32) -> float:
    """Steady-state per-call milliseconds: one warmup call (compile), then
    ``iters`` CHAINED calls under a single :func:`fence`.

    ``iters`` defaults to 32 — the measurement rule (PERF.md): per-call
    dispatch through the axon tunnel is ~0.4-1.4 ms and only pipelines
    away at chain depth ≫8, so depth-10 timings of sub-5 ms ops are
    inflated 2-3 ms. Don't lower it for "quick" numbers.

    ``fence_fn(out)`` must map the call's output to an array (or tuple of
    arrays) whose values depend on the full computation."""
    out = fn()
    f = fence_fn(out)
    fence(*(f if isinstance(f, tuple) else (f,)))  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    f = fence_fn(out)
    fence(*(f if isinstance(f, tuple) else (f,)))
    return (time.perf_counter() - t0) * 1000 / iters


class StepTimer:
    def __init__(self, sync_every: int = 50, ema: float = 0.9):
        self.sync_every = sync_every
        self.ema = ema
        self.step_time: Optional[float] = None
        self._count = 0
        self._t0 = time.perf_counter()

    def step(self, fence_value=None) -> Optional[float]:
        """Call once per train step with any tiny device array to fence on.
        Returns the current EMA step time (seconds) on sync steps, else
        None (no device sync performed)."""
        self._count += 1
        if self._count % self.sync_every:
            return None
        if fence_value is not None:
            float(jax.numpy.sum(fence_value))  # device→host fence
        t1 = time.perf_counter()
        dt = (t1 - self._t0) / self.sync_every
        self._t0 = t1
        self.step_time = dt if self.step_time is None else (
            self.ema * self.step_time + (1 - self.ema) * dt
        )
        return self.step_time


def device_memory_stats():
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


# ---------------------------------------------------------------------------
# analytic FLOP accounting (for achieved-TFLOP/s bench reporting)
# ---------------------------------------------------------------------------


def conv_graph_flops(spec, height=None, width=None) -> int:
    """Multiply-add FLOPs (2·MACs) of one forward pass through the conv
    graph of ``spec`` at the given input resolution (torch conv/pool output
    arithmetic, incl. the k=2,s=1 maxpool zero-pad special case)."""
    from mit_driverless_cv_traininginfra_tpu.config.darknet_cfg import (
        ConvBlock,
        MaxPoolBlock,
        RouteBlock,
        ShortcutBlock,
        UpsampleBlock,
    )

    h = height or spec.net.height
    w = width or spec.net.width
    chans = spec.out_channels
    res = []
    cur = (h, w)
    flops = 0
    for i, b in enumerate(spec.blocks):
        if isinstance(b, ConvBlock):
            p = (b.size - 1) // 2
            ho = (cur[0] + 2 * p - b.size) // b.stride + 1
            wo = (cur[1] + 2 * p - b.size) // b.stride + 1
            flops += 2 * ho * wo * b.size * b.size * chans[i] * b.filters
            cur = (ho, wo)
        elif isinstance(b, MaxPoolBlock):
            if b.size == 2 and b.stride == 1:
                pass  # zero-padded to keep the resolution
            else:
                p = (b.size - 1) // 2
                cur = ((cur[0] + 2 * p - b.size) // b.stride + 1,
                       (cur[1] + 2 * p - b.size) // b.stride + 1)
        elif isinstance(b, UpsampleBlock):
            cur = (cur[0] * b.stride, cur[1] * b.stride)
        elif isinstance(b, RouteBlock):
            cur = res[b.layers[0]]
        elif isinstance(b, ShortcutBlock):
            pass
        res.append(cur)
    return flops


def rektnet_flops(size: int = 80, net_size: int = 16, num_kpt: int = 7) -> int:
    """Forward FLOPs of one RektNet crop (keypoint_net.py:17-25 topology:
    7×7 stem, four residual blocks, 1×1 head — all at full resolution)."""
    hw = size * size
    f = 2 * hw * 7 * 7 * 3 * net_size  # stem
    cin = net_size
    for mult in (1, 2, 4, 8):
        cout = net_size * mult
        f += 2 * hw * (3 * 3 * cin * cout    # conv1 (dilated, same res)
                       + 3 * 3 * cout * cout  # conv2
                       + 1 * 1 * cin * cout)  # shortcut
        cin = cout
    f += 2 * hw * cin * num_kpt  # 1×1 head
    return f
