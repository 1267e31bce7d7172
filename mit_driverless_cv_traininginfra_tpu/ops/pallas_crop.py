"""Windowed-DMA ROI crop kernel — the r2-blocked design, unblocked in r3.

The serving pipeline's crop stage (`ops.image.roi_crop_bilinear_indexed`)
gathers the WHOLE frame per crop ((cap, H, W·C) ≈ 532 MB/batch at
capacity 512) before the two hat-matrix matmuls; its measured floor is
that HBM traffic (PERF.md "Windowed Pallas ROI crop"). This kernel DMAs
only a static (WROWS, WLANES) window around each box (~384 KB/crop, ~3×
less traffic) and runs both resample matmuls VMEM-resident:

    per crop i (grid=(N,)):
      window  = DMA frames[fidx[i], r0[i]·8 : +WROWS, l0[i]·128 : +WLANES]
      rows80  = Ry(sy_local) @ window          # (80, WLANES)  row hat
      out     = rows80 @ RxB(sx_local)         # (80, 80·C) col hat, built
                                               # channel-structured by iota

Toolchain history: the dynamic-start windowed DMA HUNG the axon remote
Mosaic compile in r2 (tools/probe_crop_dma.py). The r3 toolchain turns
the hang into a clean "tile index not provably divisible by 8" error, and
shipping the row start in 8-row units (``pl.ds(r0*8, WROWS)`` — provably
aligned) compiles and runs (tools/reprobe.py ``dma_dynamic_row_window_x8``).
Lane starts were always 128-aligned by construction.

Applicability contract (checked where static, documented where dynamic):
box height ≤ WROWS−16 px and width ≤ (WLANES−128)/C − 2 px (default
240 / 211 at C=3). Out-of-contract crops get border-clipped samples —
callers that can see larger boxes keep the XLA path. Sampling semantics
otherwise match `ops.image._crop_coords` (f32 coords, half-pixel centres,
border-replicate at the crop edge, clip to frame); hat weights are cast
to the frame dtype before the matmuls exactly like the XLA twin, so
outputs agree to bf16 rounding.

Replaces the host-side cv2 crop between the reference's two ONNX engines
(/root/reference/README.md:59) at HBM speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mit_driverless_cv_traininginfra_tpu.ops.image import _crop_coords

WROWS = 256    # window rows (multiple of 8)
WLANES = 768   # window lanes (multiple of 128)


def crop_kernel_applicable(H: int, W: int, C: int, out_h: int,
                           out_w: int) -> bool:
    """Static applicability: frame large enough for the window and a
    channel count the structured column matmul lays out (only the DMA
    window START must be 128-lane/8-row aligned — probe-validated with
    W·C=1248)."""
    return (H >= WROWS and W * C >= WLANES
            and out_h <= WROWS and C in (1, 3, 4))


def crop_kernel_box_limits(C: int = 3) -> tuple[float, float]:
    """(max_h, max_w) in pixels a box may span and still be sampled
    exactly by the windowed kernel (240, 211 at C=3). Larger boxes
    degrade to border-clipped crops — data-dependent, so callers that
    adopt the kernel should count violations at runtime
    (``TwoStageServer.stats()['oversize_boxes']`` does)."""
    return float(WROWS - 16), float((WLANES - 128) / C - 2)


def _make_kernel(H, W, C, out_h, out_w, dtype):
    wcols = WLANES // C  # window width in pixel columns

    def kernel(fidx_ref, r8_ref, l128_ref, phase_ref, f_hbm, sy_ref, sx_ref,
               o_ref, win, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            f_hbm.at[fidx_ref[i], pl.ds(r8_ref[i] * 8, WROWS),
                     pl.ds(l128_ref[i] * 128, WLANES)],
            win, sem)
        dma.start()

        # Ry: (out_h, WROWS) two-tap row hat from window-local sy.
        # sy/sx ride whole-array in VMEM (N×80 f32 ≈ 123 KB — Mosaic
        # rejects (1, 80) blocks) and are row-indexed by program id.
        # Built transposed — (WROWS, out_h) broadcasts sy along lanes —
        # then 2-D transposed (a probe-validated Mosaic idiom).
        sy = sy_ref[pl.ds(i, 1), :]                     # (1, out_h)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (WROWS, out_h),
                                        0).astype(jnp.float32)
        hat_t = jnp.clip(1.0 - jnp.abs(sy[0, :] - rowi), 0.0, 1.0)
        ry = hat_t.T.astype(dtype)                      # (out_h, WROWS)

        # RxB: (WLANES, out_w·C) channel-structured column hat. The
        # 128-lane-aligned window start l is generally NOT channel-aligned
        # (128 % 3 ≠ 0): window lane li holds absolute lane l+li, i.e.
        # pixel l//C + (li+r)//C and channel (li+r)%C with r = l%C (the
        # per-crop phase, scalar-prefetched). sx arrives pre-shifted by
        # l//C AND pre-repeated ×C on the host (sx_rep[m] = sx[m//C] — a
        # 2-D gather does not lower in Mosaic; a lane broadcast does), so:
        # RxB[li, m] = hat(sx_rep[m] − (li+r)//C) · ((li+r)%C == m%C)
        r = phase_ref[i]
        li = jax.lax.broadcasted_iota(jnp.int32, (WLANES, out_w * C), 0) + r
        mi = jax.lax.broadcasted_iota(jnp.int32, (WLANES, out_w * C), 1)
        src_col = (li // C).astype(jnp.float32)
        sxm = sx_ref[pl.ds(i, 1), :][0, :]              # (out_w·C,)
        hat = jnp.clip(1.0 - jnp.abs(sxm - src_col), 0.0, 1.0)
        rxb = jnp.where(li % C == mi % C, hat, 0.0).astype(dtype)

        dma.wait()
        rows = jax.lax.dot_general(
            ry, win[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)
        out = jax.lax.dot_general(
            rows, rxb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = out.astype(dtype)

    return kernel, wcols


@functools.partial(jax.jit,
                   static_argnames=("out_h", "out_w", "interpret"))
def roi_crop_windowed(frames, boxes, frame_idx, out_h: int = 80,
                      out_w: int = 80, interpret: bool = False):
    """Windowed-DMA twin of `ops.image.roi_crop_bilinear_indexed`.

    Args:
        frames: (B, H, W, C); the serving path ships bf16.
        boxes:  (N, 4) f32 xyxy pixel rectangles (contract: h ≤ WROWS−16,
            w ≤ (WLANES−128)/C − 2).
        frame_idx: (N,) int32.
        interpret: run the Pallas interpreter (CPU tests).

    Returns (N, out_h, out_w, C) crops in the frame dtype.
    """
    B, H, W, C = frames.shape
    if not crop_kernel_applicable(H, W, C, out_h, out_w):
        raise ValueError(f"crop kernel inapplicable for {frames.shape}")
    N = boxes.shape[0]
    dtype = frames.dtype

    sx, sy = _crop_coords(boxes, out_h, out_w, H, W)   # (N, out_w/out_h) f32

    # pad the flat lane dim to a 128 multiple so a 128-aligned window can
    # reach the right frame edge (one contiguous pad per batch — ~0.003
    # ms/frame at 416², vs the per-crop full-frame gather it replaces)
    WP = -(-(W * C) // 128) * 128

    # 8-aligned row window start (in 8-row units — provable alignment) and
    # 128-aligned lane start, both clipped so the window stays in-frame;
    # -1 pixel margin keeps the two-tap stencil inside even at the phase
    r8 = jnp.clip(jnp.floor(jnp.min(sy, axis=1) / 8.0).astype(jnp.int32),
                  0, (H - WROWS) // 8)
    x0lane = (jnp.floor(jnp.min(sx, axis=1)).astype(jnp.int32) - 1) * C
    l128 = jnp.clip(x0lane // 128, 0, (WP - WLANES) // 128)
    phase = (l128 * 128) % C                         # window channel phase
    q = (l128 * 128) // C                            # window pixel base

    sy_local = sy - (r8 * 8).astype(jnp.float32)[:, None]
    sx_local = sx - q.astype(jnp.float32)[:, None]
    # out-of-contract safety: clamp samples into the window (border
    # replicate) instead of reading out of bounds. The usable pixel range
    # is [1, (WLANES - phase)/C - 1); conservative static bounds:
    # (at a clipped-to-0 window the phase is 0 and pixel 0 is complete, so
    # 0.0 is a safe lower bound; elsewhere the -1 margin keeps sx_local ≥ 1)
    sy_local = jnp.clip(sy_local, 0.0, WROWS - 1.0)
    sx_local = jnp.clip(sx_local, 0.0, (WLANES - C) // C - 1.0)
    # pre-repeat sx ×C (sx_rep[m] = sx[m//C]): the kernel reads it as a
    # lane broadcast instead of a 2-D gather (which Mosaic won't lower)
    sx_rep = jnp.repeat(sx_local, C, axis=1)            # (N, out_w·C)

    kernel, _ = _make_kernel(H, W, C, out_h, out_w, dtype)
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(N,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),            # frames HBM
                # whole-array VMEM blocks (Mosaic rejects (1, 80) tiles);
                # N×out f32 ≈ 123 KB at capacity 384
                pl.BlockSpec((N, out_h), lambda i, *_: (0, 0)),   # sy
                pl.BlockSpec((N, out_w * C), lambda i, *_: (0, 0)),  # sx_rep
            ],
            out_specs=pl.BlockSpec((1, out_h, out_w * C),
                                   lambda i, *_: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((WROWS, WLANES), dtype),
                            pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((N, out_h, out_w * C), dtype),
        interpret=interpret,
    )
    flat = frames.reshape(B, H, W * C)
    if WP != W * C:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, WP - W * C)))
    out = fn(frame_idx.astype(jnp.int32), r8, l128, phase, flat,
             sy_local, sx_rep)
    return out.reshape(N, out_h, out_w, C)
