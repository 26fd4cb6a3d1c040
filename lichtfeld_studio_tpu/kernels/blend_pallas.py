"""Pallas TPU tile-blend kernel (forward + custom VJP backward).

TPU re-derivation of blend_cu / blend_backward_cu
(fastgs/rasterization/include/kernels_forward.cuh:356-461,
kernels_backward.cuh:240+). The CUDA kernels use one 256-thread block per
tile with shared-memory batching, warp ballots and atomic gradient
accumulation. The TPU formulation replaces all of that:

* one grid program per 16x16 tile; the tile's depth-sorted instance range is
  streamed from HBM in CHUNK-instance slices (double-buffered DMA);
* the sequential front-to-back transmittance recurrence becomes a prefix sum
  of log(1-alpha) along the instance axis (unrolled log-step shifts on the
  VPU), carried across chunks — the same trick as blockwise attention's
  running state, and exactly the reference's 32-instance bucket checkpoints,
  just implicit;
* per-chunk color accumulation is a [P, CHUNK] x [CHUNK, C] matmul on the
  MXU;
* early termination: the chunk loop is a while_loop that stops when every
  pixel's transmittance is below 1e-4 (reference done-flag semantics);
* backward: no atomics — the kernel replays chunks front-to-back (recomputing
  alpha, like the reference replays from bucket checkpoints) and writes
  per-instance gradients to the *sorted instance buffer*, which XLA
  scatter-adds back to gaussians through the gather's transpose.

Packed layout (feature-major so instances ride the 128-wide lane axis):
  feat [8, I]:  rows 0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b, 4 conic_c,
                5 opacity (f32); rows 6-7 carry the 4 color channels as
                bf16 PAIRS bit-packed into f32 words (row 6 = r|g,
                row 7 = b|aux) — halves the gather and stream bandwidth;
                bf16 color error (~0.4%) is invisible next to gradient noise
                and the gradient treats the quantizer as straight-through.
  out  [T, 8, P]: rows 0-3 composited channels, row 4 transmittance T_final.
  bwd dfeat [16, I]: rows 0-5 geometry grads, 8-11 color grads (full f32).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lichtfeld_studio_tpu.ops.projection import (
    MAX_FRAGMENT_ALPHA,
    MIN_ALPHA_THRESHOLD,
    TRANSMITTANCE_THRESHOLD,
)

import os as _os

# instances per streamed slice; the compact (unaligned) layout streams
# CHUNK//2-wide chunks. Overridable for tuning sweeps (tools/profile_blend).
CHUNK = int(_os.environ.get("LFS_BLEND_CHUNK", "256"))
# Mosaic requires 128-lane DMA slice alignment; the compact path streams
# CHUNK//2-wide chunks, so CHUNK must be a multiple of 256 (a bad override
# fails with an opaque device error otherwise — PERFNOTES round-3 ledger).
assert CHUNK % 256 == 0, f"LFS_BLEND_CHUNK must be a multiple of 256, got {CHUNK}"
IN_SLOTS = 4  # input-stream prefetch depth. Measured: depth 2 -> 4 changed
#   nothing (the kernels were never DMA-latency stalled — PERFNOTES round-3
#   ledger); kept at 4 because the extra slots are free VMEM.
OUT_SLOTS = 4  # backward writeback rotation depth
# sub-chunks processed per while-loop body. UNROLL=2 traces two sub-chunks
# as independent instruction streams inside one body (they couple only
# through the scalar-row transmittance seed) to give Mosaic dual-issue
# material and halve the loop/DMA skeleton. MEASURED NULL on v5e (PERFNOTES
# round-4 ledger: fwd 18.6 vs 17.7, fwd+bwd 51.8 vs 49.9, bit-identical
# outputs) — the per-chunk wall is not dependency stalls the scheduler can
# fill. Default stays 1; the path is kept (tested in interpret mode) for
# sweeps on other TPU generations.
UNROLL = int(_os.environ.get("LFS_BLEND_UNROLL", "1"))
# Backward chunk-trim threshold (the analogue of the reference's per-bucket
# skip, kernels_forward.cuh:443-455 / kernels_backward.cuh bucket gate): the
# forward records, per chunk, max_p(T_entry - T_exit) — an upper bound on any
# blending weight in the chunk — and the backward walks only up to the LAST
# chunk whose bound >= eps. Gradients of the trimmed tail are zero-filled.
# NOTE the criterion is WEIGHT-based (T*alpha), which is STRICTER than the
# reference's contribution-COUNT gate (kernels_backward.cuh:276 replays to
# the last fragment with alpha >= 1/255 regardless of transmittance): a late
# high-alpha fragment under low transmittance gets zero gradient here but a
# real (< eps) one in the reference. The bias is bounded by eps x the
# pixel's cotangent mass; tests/test_pallas_blend.py::
# test_grad_skip_eps_trim_bound pins it. 0 disables (exact full replay).
GRAD_SKIP_EPS = float(_os.environ.get("LFS_GRAD_SKIP_EPS", str(1.0 / 255.0)))
# Diagnostic (tools/walk_stats.py --pixel): record each pixel's
# SATURATION STEP (first chunk index where its running transmittance
# crossed the termination threshold) in out row 5 instead of the broadcast
# walked count — quantifies how much earlier SUB-TILE pixel blocks would
# terminate than the whole tile. Costs one compare+select per chunk; never
# enabled in production.
PIXEL_DIAG = _os.environ.get("LFS_BLEND_PIXEL_DIAG", "") == "1"
# Backward moment-contraction precision: 1 = single bf16 pass (default,
# -1.3 ms/step), 3 = bf16 hi/lo split (~16 mantissa bits). The single pass
# carries ~2^-9 worst-case conic grads after the d_ca/d_cb/d_cc
# recombination cancellation — validated before the default flip (r5): the
# full golden VJP suite passes at rtol 2e-2, and the 2k selfcheck scores
# 25.33 dB / 0.8621 SSIM vs 24.93 / 0.8553 for the 3-pass run (within
# run-to-run noise; no degradation).
MOM_PASSES = int(_os.environ.get("LFS_BLEND_MOM_PASSES", "1"))
assert MOM_PASSES in (1, 3)
# slot disjointness between the current and prefetched step needs
# IN_SLOTS >= 2*unroll (step s uses slots [s*u, s*u+u) mod IN_SLOTS)
assert UNROLL in (1, 2), f"LFS_BLEND_UNROLL must be 1 or 2, got {UNROLL}"
FEAT_ROWS_IN = 8  # streamed instance features (colors bf16-packed)
# backward per-instance gradient rows: 0-5 geometry (FULL f32 — an
# all-bf16-pairs variant measured 0.3 dB PSNR loss on the 2k-iter selfcheck,
# geometry grads are precision-sensitive), rows 6-7 the four color-channel
# grads as bf16 pairs (symmetric with the forward stream, where colors
# already enter as bf16; straight-through quantizer).
GRAD_ROWS = 8
GRAD_ROWS_BUF = 8
GRAD_COLS = 10  # unpacked per-instance gradient columns (6 geometry + 4 color)
OUT_ROWS = 8


def pack_bf16_pair(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Two f32 -> one f32 word holding (bf16(hi) | bf16(lo)). bf16 is the
    top half of f32; round-to-nearest-even before truncation."""
    def rn(x):
        b = jax.lax.bitcast_convert_type(x, jnp.int32)
        return (b + 0x7FFF + ((b >> 16) & 1)) & ~0xFFFF
    word = rn(hi) | ((rn(lo) >> 16) & 0xFFFF)
    return jax.lax.bitcast_convert_type(word, jnp.float32)


def unpack_bf16_pair(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    b = jax.lax.bitcast_convert_type(w, jnp.int32)
    hi = jax.lax.bitcast_convert_type(b & ~0xFFFF, jnp.float32)
    lo = jax.lax.bitcast_convert_type(b << 16, jnp.float32)
    return hi, lo


def _unpack_colors(f):
    """feat rows 6-7 -> [4, CHUNK] f32 colors (r, g, b, aux)."""
    r, g = unpack_bf16_pair(f[6, :])
    b, aux = unpack_bf16_pair(f[7, :])
    return jnp.stack([r, g, b, aux])


def _pixel_centers(tile_idx, grid_w: int, tile_size: int, n_pix: int):
    """Pixel-center coords for the tile's flattened pixels (row-major)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, n_pix), 1)
    tile_x = (tile_idx % grid_w) * tile_size
    tile_y = (tile_idx // grid_w) * tile_size
    pxc = (tile_x + p % tile_size).astype(jnp.float32) + 0.5
    pyc = (tile_y + p // tile_size).astype(jnp.float32) + 0.5
    return pxc, pyc  # [1, n_pix] each


def _tile_basis(tile_idx, grid_w: int, tile_size: int, n_pix: int):
    """Tile-centered quadratic pixel basis [1, px, py, px^2, px*py, py^2]
    ([6, P]) plus the tile center (cx, cy). Shared by the MXU alpha
    evaluation (both kernels) and the backward moment contraction —
    TILE-CENTERED coords keep the quadratic-expansion cancellation benign."""
    pxc, pyc = _pixel_centers(tile_idx, grid_w, tile_size, n_pix)
    cx = ((tile_idx % grid_w) * tile_size).astype(jnp.float32) + 0.5 * tile_size
    cy = ((tile_idx // grid_w) * tile_size).astype(jnp.float32) + 0.5 * tile_size
    pxl = pxc - cx  # [1, P]
    pyl = pyc - cy
    basis = jnp.concatenate(
        [jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl],
        axis=0,
    )  # [6, P]
    return basis, cx, cy


# all sigma2 thresholds live in LOG2 units: the alpha matmul folds 1/ln2 into
# its per-instance coefficients so alpha = exp2(-s) needs no scale pass (exp
# on TPU is exp2 plus a multiply; the multiply moves into [CHUNK]-wide
# coefficient work, 1/P the cost)
_LOG2_MIN_ALPHA = math.log2(MIN_ALPHA_THRESHOLD)  # = -log2(255)
_LOG2_MAX_FRAGMENT = math.log2(MAX_FRAGMENT_ALPHA)
_INV_LN2 = 1.0 / math.log(2.0)

# Inference-only early-termination threshold: the remaining accumulation
# after stopping at transmittance T is bounded by T (colors <= 1), so
# stopping at 1/512 leaves error under half a u8 quantization step —
# invisible in the viewer's 8-bit output. Training keeps the reference's
# 1e-4 (loss gradients see f32 images).
INFERENCE_TERM_THRESHOLD = 1.0 / 512.0


def _bf16_split(x):
    """x == hi + lo with hi exactly bf16-representable (truncation) and
    |lo| <= 2^-8 |x|; together they carry ~16 mantissa bits through a
    bf16 matmul pass."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi = jax.lax.bitcast_convert_type(b & ~0xFFFF, jnp.float32)
    return hi, x - hi


def _dot3(a, b, dims):
    """~16-mantissa-bit dot as THREE single-pass bf16 MXU matmuls (manual
    bfloat16_3x — Mosaic rejects Precision.HIGH, and HIGHEST costs six
    passes): (a_hi+a_lo)@(b_hi+b_lo) dropping the a_lo@b_lo term (~2^-16
    relative to TERM magnitudes). The sigma2 quadratic expansion cancels
    ~30-150x (|q0| ~ conic * tile_radius^2 vs |s| ~ log 255), so the split
    lands at |ds| ~ 1e-3 worst case — fine for the gradient replay (below
    gradient noise), NOT fine for the forward image, which stays HIGHEST."""
    ahi, alo = _bf16_split(a)
    bhi, blo = _bf16_split(b)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    return dot(ahi, bhi) + (dot(ahi, blo) + dot(alo, bhi))


def _alpha_mxu(feat_s, basis, cx, cy, in_range, exact=True):
    """alpha [CHUNK, P] with the reference skip masks, evaluated as ONE MXU
    contraction instead of ~10 VPU broadcast passes.

    sigma2(px, py) = 0.5*ca*dx^2 + cb*dx*dy + 0.5*cc*dy^2 (dx = mx - px) is a
    quadratic polynomial in tile-centered pixel coords, so sigma2 = Q . B with
    per-instance coefficients Q[6, CHUNK] (VPU work on [CHUNK]-wide vectors
    only) and the shared basis B[6, P]. log2(opacity) is folded into the
    constant term and ALL coefficients carry a 1/ln2 factor, so
    s = (sigma2 - log(op))/ln2 and alpha_raw = exp2(-s) — the exp's hidden
    log2(e) multiply moves into [CHUNK]-wide coefficient work. The reference
    skip masks become threshold compares on s (log2 units):
      sigma2 >= 0            <=>  s >= -log2(op)
      alpha_raw >= 1/255     <=>  s <= log2(255)
      alpha_raw < 0.999      <=>  s > -log2(0.999)   (backward clamp gate)
    Returns (alpha, s, nlog2_op_col) — backward recovers its masks from s.
    NOTE: gradients stay in NATURAL units — the backward's u is computed
    from alpha and the cotangents directly (u = dL/d sigma2_natural), never
    from s, so the log2 scaling never leaks into the gradient algebra."""
    mxc = feat_s[0, :] - cx  # [CHUNK] tile-centered mean
    myc = feat_s[1, :] - cy
    ca = feat_s[2, :] * _INV_LN2
    cb = feat_s[3, :] * _INV_LN2
    cc = feat_s[4, :] * _INV_LN2
    op = feat_s[5, :]
    nlog_op = -jnp.log2(jnp.maximum(op, 1e-12))  # >= 0, log2 units
    q0 = 0.5 * (ca * mxc * mxc + cc * myc * myc) + cb * mxc * myc + nlog_op
    # out-of-range lanes fold into the constant term ([CHUNK]-sized select)
    # instead of a [CHUNK, P] mask pass: s ~ 1e10 makes exp(-s) underflow to
    # exactly 0 and fails the s <= log(255) keep test. in_range arrives
    # LANE-MAJOR [1, CHUNK] — a [CHUNK, 1] orientation here forces a
    # sublane->lane relayout that measurably costs more than the saved pass.
    q0 = jnp.where(in_range[0], q0, 1e10)
    q1 = -(ca * mxc + cb * myc)
    q2 = -(cc * myc + cb * mxc)
    q = jnp.stack([q0, q1, q2, 0.5 * ca, cb, 0.5 * cc])  # [6, CHUNK]
    dims = (((0,), (0,)), ((), ()))
    if exact:
        # forward/image path: 6-pass f32-faithful (the expansion cancels
        # ~30-150x, see _dot3's docstring)
        s = jax.lax.dot_general(
            q, basis, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [CHUNK, P]
    else:
        # gradient replay: 3-pass split, |ds| ~ 1e-3 worst case (below
        # gradient noise; mask flips only at negligible-weight boundaries)
        s = _dot3(q, basis, dims)  # [CHUNK, P]
    nlog_op_col = nlog_op[:, None]
    alpha = jnp.minimum(jnp.exp2(-s), MAX_FRAGMENT_ALPHA)
    keep = (s >= nlog_op_col) & (s <= -_LOG2_MIN_ALPHA)
    return jnp.where(keep, alpha, 0.0), s, nlog_op_col


def _prefix_sum_rows(x):
    """Inclusive prefix sum along axis 0 (instances) via unrolled log-step
    shifts — O(log CHUNK) VPU passes, no MXU."""
    n = x.shape[0]
    shift = 1
    while shift < n:
        shifted = jnp.pad(x, ((shift, 0), (0, 0)))[:n]
        x = x + shifted
        shift *= 2
    return x


def _prefix_prod_rows(x):
    """Inclusive prefix PRODUCT along axis 0 — the front-to-back
    transmittance recurrence computed directly as shift-multiplies
    (identical math to the reference's serial (1-alpha) products,
    kernels_forward.cuh:398-409) instead of log/exp round-trips: saves two
    transcendental passes per chunk element."""
    n = x.shape[0]
    shift = 1
    while shift < n:
        shifted = jnp.pad(x, ((shift, 0), (0, 0)), constant_values=1.0)[:n]
        x = x * shifted
        shift *= 2
    return x


def _forward_kernel(
    tile_start_ref,
    tile_count_ref,
    feat_hbm,  # [8, I+pad] ANY/HBM (colors bf16-packed in rows 6-7)
    out_ref,  # [1, 8, P] VMEM
    feat_s,  # scratch [IN_SLOTS, 8, CHUNK] VMEM
    sem,  # DMA semaphores (IN_SLOTS,)
    *,
    grid_w: int,
    tile_size: int,
    aligned: bool,
    exact_alpha: bool = True,
    freeze: bool = True,
    chunk: int = CHUNK,
    unroll: int = 1,
):
    n_pix = tile_size * tile_size
    t = pl.program_id(0)
    # aligned=False accepts UNALIGNED tile starts (the inference binning
    # skips the chunk-aligned relayout entirely): DMA from the aligned
    # window below `start` and mask the foreign prefix/suffix lanes.
    # aligned=True is the training layout — a STATIC variant so the extra
    # offset arithmetic/masking is compiled out of the train step.
    count = tile_count_ref[t]
    if aligned:
        start = pl.multiple_of(tile_start_ref[t], chunk)
        off = 0
        base = start
    else:
        start = tile_start_ref[t]
        off = jax.lax.rem(start, chunk)
        base = pl.multiple_of(start - off, chunk)
    end_rel = off + count
    n_chunks = pl.cdiv(end_rel, chunk)
    # the while loop walks STEPS of `unroll` sub-chunks; the trailing
    # phantom sub-chunk of an odd tail is fully masked (alpha = 0) and its
    # DMA reads the >= unroll*chunk instance-axis padding
    n_steps = pl.cdiv(end_rel, chunk * unroll)
    basis, cx, cy = _tile_basis(t, grid_w, tile_size, n_pix)

    def dma(slot, ci):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(base + ci * chunk, chunk)],
            feat_s.at[slot],
            sem.at[slot],
        )

    # one-step-ahead prefetch (unroll sub-chunks in flight). Measured
    # ablations (PERFNOTES r3) show the kernel is NEITHER DMA-latency nor
    # VPU-pass bound — prefetch depth 2 -> 4 changed nothing; the ~2.6 us
    # per-chunk wall is dependency-stall/VLIW overhead, which is what the
    # unrolled body attacks.
    for j in range(unroll):
        @pl.when(n_steps > 0)
        def _(j=j):
            dma(j, j).start()

    # inference stops at the u8-invisible 1/512 (see INFERENCE_TERM_THRESHOLD);
    # training keeps reference 1e-4 done-flag semantics
    term = TRANSMITTANCE_THRESHOLD if freeze else INFERENCE_TERM_THRESHOLD

    def cond(carry):
        # t_run is monotone non-increasing, so this terminates as soon as
        # every pixel in the tile saturates (the reference's `done` ballot)
        si, t_run = carry[0], carry[1]
        return (si < n_steps) & (jnp.max(t_run) >= term)

    def body(carry):
        # t_run [1, P]: the UNFROZEN running product of (1-alpha) — the
        # oracle's monotone cum chain (blend_ref.py). counted/t_before come
        # from it, so the counted set is a strict per-pixel prefix (INRIA
        # done-flag semantics; the frozen-carry formulation could re-admit
        # post-crossing contributions AND never tripped the cond's
        # early-exit because the frozen value stays >= the threshold).
        # The FROZEN transmittance (T after the last counted contribution,
        # the kernel's alpha output) is NOT tracked per chunk: the weights
        # telescope — w_i = t_before_i - p_incl_i with t_before_{i+1} ==
        # p_incl_i — so sum(counted w) == 1 - T_frozen EXACTLY, and a row of
        # ones in the color matmul accumulates it for free on the MXU. This
        # deletes the old per-chunk freeze bookkeeping (select + min-reduce
        # + broadcast, ~3 VPU passes) and one carry array.
        # contrib_row [1, P]: lane ci holds max_p(T_entry - T_exit) for chunk
        # ci — the telescoped per-pixel total blending weight of the chunk,
        # maxed over pixels. An upper bound on every weight inside the chunk,
        # recorded for the backward's tail trim (GRAD_SKIP_EPS); costs one
        # [1, P] subtract + max-reduce + select per chunk (~free next to the
        # [CHUNK, P] work).
        if PIXEL_DIAG:
            si, t_run, acc, contrib_row, cross_row = carry
        else:
            si, t_run, acc, contrib_row = carry

        @pl.when(si + 1 < n_steps)
        def _():
            for j in range(unroll):
                ci_n = (si + 1) * unroll + j
                dma(ci_n % IN_SLOTS, ci_n).start()

        dotc = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # the unroll sub-chunks are traced as independent instruction
        # streams (they couple only through the [1, P] transmittance seed),
        # so Mosaic can interleave their dependent-op chains
        for j in range(unroll):
            ci = si * unroll + j
            dma(ci % IN_SLOTS, ci).wait()
            f = feat_s[ci % IN_SLOTS]  # [8, CHUNK]

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            if aligned:
                in_range = lane < count - ci * chunk
            else:
                gi = ci * chunk + lane
                in_range = (gi >= off) & (gi < end_rel)
            # inference renders accept the 3-pass split (|dalpha| ~ 1e-3
            # worst case, below the viewer's u8 quantization step of 1/255);
            # training forwards stay exact for the loss and the
            # compiled-parity gate
            alpha, _, _ = _alpha_mxu(
                f, basis, cx, cy, in_range, exact=exact_alpha
            )  # [CHUNK, P]

            prod_incl = _prefix_prod_rows(1.0 - alpha)  # [CHUNK, P]
            p_incl = t_run * prod_incl
            # exclusive chain = inclusive shifted down one row, seeded by
            # the carry — ONE copy instead of a pad-shift plus a multiply
            t_before = jnp.concatenate([t_run, p_incl[: chunk - 1]], axis=0)
            # w = t_before * alpha, computed as the telescoping difference
            # (exact in real arithmetic; float error ~eps/alpha_min ~ 2e-5)
            if freeze:
                # reference done-flag semantics: the counted set is the
                # strict per-pixel prefix with transmittance >= threshold
                counted = p_incl >= TRANSMITTANCE_THRESHOLD
                w = jnp.where(counted, t_before - p_incl, 0.0)  # [CHUNK, P]
            else:
                # inference: skip the freeze cut — post-crossing
                # contributions carry weight < 1e-4, under the u8 step
                w = t_before - p_incl  # [CHUNK, P]

            colors = jnp.maximum(_unpack_colors(f), 0.0)  # [4, CHUNK]
            # row 4 = ones: accumulates sum(w) -> frozen T = 1 - acc[4]
            colors5 = jnp.concatenate(
                [colors, jnp.ones((1, chunk), jnp.float32)], axis=0
            )  # [5, CHUNK]
            if freeze:
                # colors are exactly bf16 by construction (and the ones row
                # exactly), so splitting only w gives an f32-faithful image
                # in TWO single-pass matmuls (vs 6 at HIGHEST)
                w_hi, w_lo = _bf16_split(w)
                acc = acc + dotc(colors5, w_hi) + dotc(colors5, w_lo)
            else:
                # inference: ONE default-precision pass — w's bf16
                # truncation is a 2^-9 relative rounding on each weight,
                # the same order as the viewer's u8 quantization step
                acc = acc + dotc(colors5, w)  # [5, P]

            t_exit = p_incl[chunk - 1 : chunk, :]
            if freeze:
                contrib = jnp.max(t_run - t_exit)  # scalar
                lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, n_pix), 1)
                ci_cl = jnp.minimum(ci, n_pix - 1)
                contrib_row = jnp.where(lane_p == ci_cl, contrib, contrib_row)
            if PIXEL_DIAG:
                # cross_row rides the contrib_row carry slot semantics: a
                # pixel's saturation step is recorded once, at its first
                # sub-threshold chunk exit
                cross_row = jnp.where(
                    (cross_row < 0.0) & (t_exit < TRANSMITTANCE_THRESHOLD),
                    jnp.float32(ci + 1), cross_row,
                )
            t_run = t_exit

        if PIXEL_DIAG:
            return si + 1, t_run, acc, contrib_row, cross_row
        return si + 1, t_run, acc, contrib_row

    init = (
        jnp.asarray(0, jnp.int32),
        jnp.ones((1, n_pix), jnp.float32),
        jnp.zeros((5, n_pix), jnp.float32),
        jnp.zeros((1, n_pix), jnp.float32),
    )
    if PIXEL_DIAG:
        init = init + (jnp.full((1, n_pix), -1.0, jnp.float32),)
    fin = jax.lax.while_loop(cond, body, init)
    si_end, _, acc, contrib_row = fin[0], fin[1], fin[2], fin[3]

    # early exit leaves one step's prefetches in flight — consume them
    # or the DMA semaphores are imbalanced at program end (device-fatal)
    for j in range(unroll):
        @pl.when(si_end < n_steps)
        def _(j=j):
            dma((si_end * unroll + j) % IN_SLOTS, si_end * unroll + j).wait()

    out_ref[0, 0:4, :] = acc[0:4]
    # telescoped frozen transmittance: T = 1 - sum(counted weights)
    out_ref[0, 4, :] = 1.0 - acc[4]
    # diagnostics (free: rows were zero-filled anyway): walked vs total
    # chunks for this tile — the early-termination effectiveness signal
    # consumed by tools/walk_stats.py. Row 5 is REWRITTEN by the backward
    # caller (g_aug carries CG_final there), never read from the fwd output.
    walked = jnp.minimum(si_end * unroll, n_chunks)
    if PIXEL_DIAG:
        # unsaturated pixels (cross_row still -1) report the full walk
        out_ref[0, 5, :] = jnp.where(
            fin[4][0] < 0.0, walked.astype(jnp.float32), fin[4][0]
        )
    else:
        out_ref[0, 5, :] = jnp.broadcast_to(walked.astype(jnp.float32), (n_pix,))
    out_ref[0, 6, :] = jnp.broadcast_to(n_chunks.astype(jnp.float32), (n_pix,))
    # row 7: lane ci = chunk ci's max contribution bound (freeze path only;
    # zeros for inference). Consumed by the backward caller's tail trim and
    # tools/walk_stats.py. Row 5/7 are REWRITTEN in the backward cotangent
    # (g_aug), never read from the fwd output there.
    out_ref[0, 7, :] = contrib_row[0]


def _backward_kernel(
    tile_start_ref,
    tile_count_ref,
    tile_neff_ref,  # [T] int32 — chunks to walk (tail trim, GRAD_SKIP_EPS)
    feat_hbm,  # [8, I+pad] ANY (colors bf16-packed in rows 6-7)
    gout_ref,  # [1, 8, P] VMEM — cotangents (rows 0-3 channels, row 4 T_final)
    tfin_ref,  # [1, 1, P] VMEM — forward T_final
    dfeat_hbm,  # out [GRAD_ROWS, I+pad] ANY (bf16 pairs)
    feat_s,  # scratch [IN_SLOTS, 8, CHUNK]
    dfeat_s,  # scratch [OUT_SLOTS, GRAD_ROWS, CHUNK] (rotated writeback)
    head_s,  # scratch [GRAD_ROWS, CHUNK] — boundary-chunk merge (unaligned)
    sem,  # (IN_SLOTS,) DMA semaphores
    outsem,  # (OUT_SLOTS,) DMA semaphores for writeback
    headsem,  # DMA semaphore for the boundary read
    *,
    grid_w: int,
    tile_size: int,
    aligned: bool,
    chunk: int = CHUNK,
    unroll: int = 1,
):
    n_pix = tile_size * tile_size
    t = pl.program_id(0)
    count = tile_count_ref[t]
    if aligned:
        # the aligned layout guarantees chunk-multiple starts; Mosaic needs
        # the hint to prove lane-dim DMA slice alignment.
        start = pl.multiple_of(tile_start_ref[t], chunk)
        off = 0
        base = start
    else:
        # COMPACT layout (no relayout): tile ranges start anywhere. Stream
        # whole aligned chunks covering [start, start+count); foreign lanes
        # compute zero gradients (alpha in_range-masked). Boundary handling:
        # grid programs run SEQUENTIALLY on the TPU core and each program
        # drains its writeback DMAs before ending, so the FIRST chunk is
        # read-merged with the previous tile's already-written values
        # (foreign head lanes preserved), while our trailing foreign lanes
        # are zeros that the NEXT program's head-merge overwrites in turn.
        start = tile_start_ref[t]
        off = jax.lax.rem(start, chunk)
        base = pl.multiple_of(start - off, chunk)
    end_rel = off + count
    n_chunks = pl.cdiv(end_rel, chunk)
    # step = `unroll` sub-chunks per loop body (see the forward kernel); a
    # trailing phantom sub-chunk is fully masked, computes zero gradients,
    # and writes into the >= unroll*chunk output padding
    n_steps_full = pl.cdiv(end_rel, chunk * unroll)
    # tail trim: the forward recorded per-chunk max-contribution bounds; the
    # caller reduced them to "last chunk worth replaying" (>= 1 so the
    # unaligned head-boundary merge always runs — zbody alone would clobber
    # the previous tile's lanes in the shared boundary chunk). Chunks past
    # the trim are zero-filled by zbody, exactly like early-terminated ones.
    n_steps = jnp.minimum(n_steps_full, pl.cdiv(tile_neff_ref[t], unroll))
    # tile-centered pixel moment basis: shared by the MXU alpha evaluation
    # and the geometry-gradient moment contraction (loop-invariant)
    basis, cx, cy = _tile_basis(t, grid_w, tile_size, n_pix)

    g_img = gout_ref[0, 0:4, :]  # [4, P]
    g_tfin = gout_ref[0, 4, :][None, :]  # [1, P]
    t_final = tfin_ref[0, 0, :][None, :]  # [1, P]

    def dma_in(slot, ci):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(base + ci * chunk, chunk)],
            feat_s.at[slot],
            sem.at[slot],
        )

    def dma_out(slot, ci):
        return pltpu.make_async_copy(
            dfeat_s.at[slot],
            dfeat_hbm.at[:, pl.ds(base + ci * chunk, chunk)],
            outsem.at[slot],
        )

    def dma_head_read():
        return pltpu.make_async_copy(
            dfeat_hbm.at[:, pl.ds(base, chunk)], head_s, headsem
        )

    # one-step-ahead input prefetch (unroll sub-chunks in flight; depth was
    # measured irrelevant — see forward kernel)
    for j in range(unroll):
        @pl.when(n_steps > 0)
        def _(j=j):
            dma_in(j, j).start()

    @pl.when(n_chunks > 0)
    def _():
        if not aligned:
            dma_head_read().start()

    # CG_final[p] = sum_j w_j * (c_j . g[:,p]) — computed incrementally:
    # r_i = CG_final - cumsum_incl(w * cg) is the "remainder color dot grad".
    # We don't know CG_final until the end of the replay, but
    # CG_final - A_i = sum_{j>i} w_j cg_j, and termination zeroes the tail, so
    # we instead accumulate A_i forward and use the identity
    # sum_ch C_final g = A_last; the remainder for instance i inside chunk ci
    # is (A_last - A_i). Two-pass within the kernel would need a second
    # replay; instead we compute A_last on the fly: the forward pass already
    # gives C_final implicitly, but to stay single-pass we use
    # r_i = (A_total - A_i) where A_total = CG_final reconstructed from the
    # *forward output cotangent contraction*: the caller passes
    # sum_ch C_final[ch,p] g[ch,p] precomputed in gout row 5.
    # dalpha folds its two divisions into one: the T_final cotangent term
    # g_tfin * T_final / (1-a) rides the same 1/(1-a) as the remainder, so
    # r0 = CG_final + g_tfin * T_final is precomputed ONCE (loop-invariant)
    # and dalpha = t_before*cg - (r0 - A_i) / (1-a).
    r0 = gout_ref[0, 5, :][None, :] + g_tfin * t_final  # [1, P]

    def cond(carry):
        # t_run (unfrozen chain) is monotone non-increasing — terminates
        # when every pixel saturates, exactly like the forward pass
        si, t_run, _ = carry
        return (si < n_steps) & (jnp.max(t_run) >= TRANSMITTANCE_THRESHOLD)

    def body(carry):
        # t_run: UNFROZEN running (1-alpha) product (see forward kernel) —
        # keeps the replayed counted set a strict prefix, identical to the
        # forward's. a_run [1, P]: cumulative sum w*cg so far.
        si, t_run, a_run = carry

        @pl.when(si + 1 < n_steps)
        def _():
            for j in range(unroll):
                ci_n = (si + 1) * unroll + j
                dma_in(ci_n % IN_SLOTS, ci_n).start()

        # unroll sub-chunks traced as independent instruction streams (they
        # couple only through the [1, P] transmittance / wcg-sum seeds), so
        # Mosaic can interleave their dependent-op chains — see fwd kernel
        for j in range(unroll):
            ci = si * unroll + j
            dma_in(ci % IN_SLOTS, ci).wait()
            f = feat_s[ci % IN_SLOTS]

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            if aligned:
                in_range_col = lane < count - ci * chunk
            else:
                gi = ci * chunk + lane
                in_range_col = (gi >= off) & (gi < end_rel)
            # exact (HIGHEST) alpha: the [6, CHUNK] contraction is tiny, so
            # the 6-pass precision is ~free here (measured), and it keeps
            # the replay masks bit-identical with the forward pass
            alpha, s, nlog_op_col = _alpha_mxu(f, basis, cx, cy, in_range_col)

            prod_incl = _prefix_prod_rows(1.0 - alpha)
            p_incl = t_run * prod_incl
            counted = p_incl >= TRANSMITTANCE_THRESHOLD
            # exclusive chain = inclusive shifted one row, seeded by the
            # carry — one copy instead of pad-shift + multiply
            t_before = jnp.concatenate([t_run, p_incl[: chunk - 1]], axis=0)
            w = jnp.where(counted, t_before - p_incl, 0.0)

            raw_colors = _unpack_colors(f)  # [4, CHUNK]
            colors = jnp.maximum(raw_colors, 0.0)

            # color gradient: dL/dc[ch, i] = sum_p w[i,p] g_img[ch,p].
            # DEFAULT (single-pass bf16) precision on the two
            # color-cotangent matmuls: colors already enter as bf16 and
            # dcolor is STORED as bf16 pairs, so the 2^-8 relative input
            # rounding adds no new error class (gradient-noise dominated);
            # HIGHEST would stream the big [CHUNK,P] operand six times.
            dcolor = jax.lax.dot_general(
                g_img, w, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [4, CHUNK]
            # clamp max(c,0): zero grad where c < 0
            dcolor = jnp.where(raw_colors > 0.0, dcolor, 0.0)

            # cg[i, p] = c_i . g_img[:, p]
            cg = jax.lax.dot_general(
                colors, g_img, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [CHUNK, P]

            wcg = w * cg
            a_incl = a_run + _prefix_sum_rows(wcg)  # [CHUNK, P] inclusive

            # d(loss)/d(sigma2) = -alpha * dalpha with
            #   dalpha = t_before*cg - (r0 - a_incl)/(1-alpha)
            # expanded so the first term reuses wcg (w == t_before*alpha
            # within `counted`, and `live` below is a subset of `counted`):
            #   u = alpha/(1-alpha) * (r0 - a_incl) - wcg
            # — two fewer [CHUNK, P] passes than forming dalpha then
            # scaling. T_final = prod(1-a): dT/da_i = -T/(1-a_i), folded
            # into r0. No epsilon guard: alpha is clamped at
            # MAX_FRAGMENT_ALPHA=0.999 (or masked to 0), so 1-alpha >= 1e-3.
            # `live` zeroes rows clamped at 0.999 (s > -log(0.999) <=>
            # alpha_raw < 0.999, the clamp gate) and rows outside the
            # counted prefix.
            live = (s > -_LOG2_MAX_FRAGMENT) & counted
            u = jnp.where(
                live, (alpha / (1.0 - alpha)) * (r0 - a_incl) - wcg, 0.0
            )  # d(loss)/d(sigma2)

            # --- geometry gradients via ONE moment matmul -----------------
            # dx = mx - px is separable, so every per-pixel reduction
            #   sum_p u * poly(dx, dy)
            # is linear in the six moments M = u @ [1,px,py,px^2,px*py,py^2]
            # (pixel coords TILE-CENTERED to keep the expansion cancellation
            # benign). This replaces six [CHUNK, P] VPU rowsum chains with
            # one [CHUNK, P] x [P, 6] MXU contraction — the backward kernel
            # is VPU compute-bound, so cutting per-pixel polynomial work is
            # the lever. d_op rides the same moments: within `live`,
            # g = alpha / op, so sum_p dalpha * g = -(sum_p u)/op = -S0/op.
            # [6, CHUNK] orientation: instances stay on the LANE axis so the
            # row extracts below are plain sublane reads (no relayout).
            # 3-pass bf16 split (~16 mantissa bits): this contraction runs
            # over P=1024 so precision passes multiply REAL work (the single
            # hot matmul of the replay, measured ~6 ms/step at HIGHEST). The
            # d_ca/d_cb/d_cc recombination cancels ~tile_r^2, amplifying the
            # 2^-16 split error to ~2^-9 worst-case on conic grads —
            # validated against the selfcheck PSNR/SSIM trajectory
            # (geometry-grad precision is the known 0.3 dB hazard at 2^-8).
            if MOM_PASSES == 3:
                mom = _dot3(basis, u, (((1,), (1,)), ((), ())))  # [6, CHUNK]
            else:
                mom = jax.lax.dot_general(
                    basis, u, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [6, CHUNK] single bf16 pass
            s0 = mom[0, :]
            sx = mom[1, :]
            sy = mom[2, :]
            sxx = mom[3, :]
            sxy = mom[4, :]
            syy = mom[5, :]
            ca = f[2, :]
            cb = f[3, :]
            cc = f[4, :]
            op = f[5, :]
            mxc = f[0, :] - cx  # tile-centered means [CHUNK]
            myc = f[1, :] - cy
            ex = mxc * s0 - sx  # sum_p u * dx
            ey = myc * s0 - sy
            d_mx = ca * ex + cb * ey
            d_my = cc * ey + cb * ex
            d_ca = 0.5 * (mxc * mxc * s0 - 2.0 * mxc * sx + sxx)
            d_cb = mxc * myc * s0 - mxc * sy - myc * sx + sxy
            d_cc = 0.5 * (myc * myc * s0 - 2.0 * myc * sy + syy)
            d_op = -s0 / jnp.maximum(op, 1e-12)

            # OUT_SLOTS-rotated writeback: reclaim this slot's previous
            # copy, fill, start
            oslot = ci % OUT_SLOTS

            @pl.when(ci >= OUT_SLOTS)
            def _():
                dma_out(oslot, ci - OUT_SLOTS).wait()

            dfeat_s[oslot, 0:6, :] = jnp.stack(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op]
            )
            dfeat_s[oslot, 6, :] = pack_bf16_pair(dcolor[0], dcolor[1])
            dfeat_s[oslot, 7, :] = pack_bf16_pair(dcolor[2], dcolor[3])
            if not aligned and j == 0:
                # head-boundary merge: lanes before `off` hold the PREVIOUS
                # tile's gradients (written by the previous grid program,
                # whose writebacks drained before this program started) —
                # preserve them. Our own foreign-lane gradients are zero by
                # construction, so the next tile symmetrically overwrites
                # our trailing zeros.
                @pl.when(si == 0)
                def _():
                    dma_head_read().wait()
                    lane_row = jax.lax.broadcasted_iota(
                        jnp.int32, (GRAD_ROWS_BUF, chunk), 1
                    )
                    dfeat_s[oslot] = jnp.where(
                        lane_row >= off, dfeat_s[oslot], head_s[...]
                    )
            dma_out(oslot, ci).start()

            # the inclusive prefix's last row IS a_run + sum(wcg)
            a_run = a_incl[chunk - 1 : chunk, :]
            t_run = p_incl[chunk - 1 : chunk, :]

        return si + 1, t_run, a_run

    si_end, _, _ = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(0, jnp.int32),
            jnp.ones((1, n_pix), jnp.float32),
            jnp.zeros((1, n_pix), jnp.float32),
        ),
    )

    # early exit leaves one step's input prefetches in flight — consume
    # them or the DMA semaphores are imbalanced (device-fatal)
    for j in range(unroll):
        @pl.when(si_end < n_steps)
        def _(j=j):
            dma_in((si_end * unroll + j) % IN_SLOTS, si_end * unroll + j).wait()

    # chunks written by the walk (a full walk writes the phantom tail chunk
    # too — zero grads into the >= unroll*chunk output padding)
    ci_end = jnp.where(si_end == n_steps, n_steps * unroll, si_end * unroll)

    # Zero-fill gradient chunks skipped by early termination (the output HBM
    # buffer is uninitialized memory otherwise), continuing the slot rotation.
    def zbody(ci):
        oslot = ci % OUT_SLOTS

        @pl.when(ci >= OUT_SLOTS)
        def _():
            dma_out(oslot, ci - OUT_SLOTS).wait()

        dfeat_s[oslot, :, :] = jnp.zeros((GRAD_ROWS_BUF, chunk), jnp.float32)
        dma_out(oslot, ci).start()
        return ci + 1

    n_written = jax.lax.while_loop(lambda ci: ci < n_chunks, zbody, ci_end)

    # drain outstanding writebacks before the program ends
    for j in range(1, OUT_SLOTS + 1):
        @pl.when(n_written >= j)
        def _(j=j):
            dma_out((n_written - j) % OUT_SLOTS, n_written - j).wait()


def _pad_feat(feat: jax.Array) -> jax.Array:
    """Pad the instance axis so chunked DMA never reads out of bounds
    (2*CHUNK floor covers the unrolled walk's phantom tail sub-chunk for
    any kernel chunk <= CHUNK at UNROLL <= 2)."""
    i = feat.shape[1]
    pad = (-i) % CHUNK + 2 * CHUNK
    return jnp.pad(feat, ((0, 0), (0, pad)))


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests/CI — an improvement over the
    reference, whose kernel tests skip without CUDA)."""
    return jax.default_backend() not in ("tpu", "axon")


def _pack8_t(packed16_t: jax.Array) -> jax.Array:
    """[16, N] f32 per-gaussian features (feature-major, tiles.pack_features_t)
    -> [8, N] streamed layout: rows 0-5 geometry, 6 = bf16(r)|bf16(g),
    7 = bf16(b)|bf16(aux)."""
    return jnp.concatenate(
        [
            packed16_t[0:6],
            pack_bf16_pair(packed16_t[8], packed16_t[9])[None, :],
            pack_bf16_pair(packed16_t[10], packed16_t[11])[None, :],
        ],
        axis=0,
    )


@jax.custom_vjp
def pack_colors_pair(r, g, b, aux):
    """[N]x4 -> [2, N] bf16-pair color words with a STRAIGHT-THROUGH
    gradient (the backward emits dcolor already bf16-paired in the same
    rows; the quantizer itself is identity-gradient)."""
    return jnp.stack([pack_bf16_pair(r, g), pack_bf16_pair(b, aux)])


def _pack_colors_pair_fwd(r, g, b, aux):
    return pack_colors_pair(r, g, b, aux), None


def _pack_colors_pair_bwd(_, d):
    dr, dg = unpack_bf16_pair(d[0])
    db, daux = unpack_bf16_pair(d[1])
    return dr, dg, db, daux


pack_colors_pair.defvjp(_pack_colors_pair_fwd, _pack_colors_pair_bwd)


def pack_stream8(proj, with_depth: bool = False) -> jax.Array:
    """Per-gaussian streamed blend features [8, C] built DIRECTLY from the
    projection (rows 0-5 geometry f32, rows 6-7 bf16-paired colors+aux) —
    skips the [16, C] pack_features_t intermediate, which cost ~1 ms/step
    of pure concatenate/slice materialization at 1M capacity. Differentiable
    end to end (colors via the straight-through pair quantizer)."""
    c = proj.mean2d.shape[0]
    geo = jnp.stack(
        [
            proj.mean2d[:, 0],
            proj.mean2d[:, 1],
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            proj.opacity,
        ],
        axis=0,
    )  # [6, C]
    aux = proj.depth if with_depth else jnp.zeros((c,), proj.mean2d.dtype)
    colors = pack_colors_pair(
        proj.color[:, 0], proj.color[:, 1], proj.color[:, 2], aux
    )  # [2, C]
    return jnp.concatenate([geo, colors], axis=0)  # [8, C]


def _forward_call(feat_t, tile_start, tile_count, grid_w, grid_h, tile_size,
                  aligned=True, exact_alpha=True, freeze=True, chunk=CHUNK):
    num_tiles = grid_w * grid_h
    n_pix = tile_size * tile_size
    kernel = functools.partial(
        _forward_kernel, grid_w=grid_w, tile_size=tile_size, aligned=aligned,
        exact_alpha=exact_alpha, freeze=freeze, chunk=chunk, unroll=UNROLL,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, OUT_ROWS, n_pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((IN_SLOTS, FEAT_ROWS_IN, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((IN_SLOTS,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_ROWS, n_pix), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(tile_start, tile_count, feat_t)


def _backward_call(feat_t, tile_start, tile_count, out, g_out, grid_w, grid_h,
                   tile_size, aligned=True, chunk=CHUNK):
    num_tiles = grid_w * grid_h
    n_pix = tile_size * tile_size

    # row 5 of the cotangent carries CG_final = sum_ch C_final[ch,p]*g[ch,p]
    cg_final = jnp.sum(out[:, 0:4, :] * g_out[:, 0:4, :], axis=1, keepdims=True)
    g_aug = jnp.concatenate(
        [g_out[:, 0:5, :], cg_final, jnp.zeros_like(g_out[:, 6:8, :])], axis=1
    )
    t_final = out[:, 4:5, :]

    # tail trim (GRAD_SKIP_EPS): fwd row 7 lane ci = chunk ci's contribution
    # bound. n_eff = 1 + last significant lane, floored at 1 (the unaligned
    # boundary merge must run). Tiles deeper than n_pix chunks overflowed the
    # lane diagnostics — replay those fully.
    if GRAD_SKIP_EPS > 0.0:
        contrib = out[:, 7, :]  # [T, P]
        lanes = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 1)
        n_eff = jnp.max(
            jnp.where(contrib >= GRAD_SKIP_EPS, lanes + 1, 0), axis=1
        )
        n_eff = jnp.maximum(n_eff, 1)
        n_eff = jnp.where(
            out[:, 6, 0] > float(n_pix), jnp.int32(2**30), n_eff
        ).astype(jnp.int32)
    else:
        n_eff = jnp.full((num_tiles,), 2**30, jnp.int32)

    kernel = functools.partial(
        _backward_kernel, grid_w=grid_w, tile_size=tile_size, aligned=aligned,
        chunk=chunk, unroll=UNROLL,
    )
    dfeat_t = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # feat
                pl.BlockSpec(
                    (1, OUT_ROWS, n_pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
                ),  # g_aug
                pl.BlockSpec(
                    (1, 1, n_pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
                ),  # t_final
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((IN_SLOTS, FEAT_ROWS_IN, chunk), jnp.float32),
                pltpu.VMEM((OUT_SLOTS, GRAD_ROWS_BUF, chunk), jnp.float32),
                pltpu.VMEM((GRAD_ROWS_BUF, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((IN_SLOTS,)),
                pltpu.SemaphoreType.DMA((OUT_SLOTS,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((GRAD_ROWS_BUF, feat_t.shape[1]), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=_interpret(),
    )(tile_start, tile_count, n_eff, feat_t, g_aug, t_final)
    # NOTE: tiles share instances only through disjoint [start, end) ranges
    # (each instance belongs to exactly one tile), so per-tile writebacks
    # never collide.
    return dfeat_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14))
def _blend_gathered(
    packed_t, g_pad, slot_layout, slot_g, valid, n_touched, tile_counts_pair,
    grid_w, grid_h, tile_size, source_cap, layout_chunk, exact_alpha, freeze,
    stream8,
):
    out, _ = _blend_gathered_fwd(
        packed_t, g_pad, slot_layout, slot_g, valid, n_touched,
        tile_counts_pair,
        grid_w, grid_h, tile_size, source_cap, layout_chunk, exact_alpha, freeze,
        stream8,
    )
    return out


def _gather_stream(packed_t, g_pad, valid, stream8=False):
    """[16,N] or [8,N] -> streamed [8, I_pad(+chunk pad)]: bf16-pack colors
    at the gaussian level, ONE half-width LANE gather (instances stay on the
    lane axis end to end — no transpose, no 128-lane padding waste)."""
    feat8_t = packed_t if stream8 else _pack8_t(packed_t)  # [8, N]
    gathered = jnp.where(valid[None, :], jnp.take(feat8_t, g_pad, axis=1), 0.0)
    i = gathered.shape[1]
    # 2*CHUNK floor: the unrolled walk may DMA one phantom sub-chunk past
    # the last real one (see _forward_kernel), and the backward writes its
    # zero grads into the same padding
    pad = (-i) % CHUNK + 2 * CHUNK
    return jnp.pad(gathered, ((0, 0), (0, pad)))


def _blend_gathered_fwd(
    packed_t, g_pad, slot_layout, slot_g, valid, n_touched, tile_counts_pair,
    grid_w, grid_h, tile_size, source_cap, layout_chunk, exact_alpha=True,
    freeze=True, stream8=False,
):
    # layout_chunk == 1 is the compact (inference) layout: the forward
    # kernel handles unaligned tile starts with half-size chunks (boundary
    # waste per tile averages chunk/2 lanes, and the forward-only working
    # set is small). layout_chunk > 1 is the training layout: tile starts
    # are layout_chunk-aligned and the kernels stream exactly that chunk.
    aligned = layout_chunk > 1
    tile_start, tile_count = tile_counts_pair
    feat_t = _gather_stream(packed_t, g_pad, valid, stream8)
    out = _forward_call(
        feat_t, tile_start, tile_count, grid_w, grid_h, tile_size,
        aligned=aligned, exact_alpha=exact_alpha, freeze=freeze,
        chunk=layout_chunk if aligned else CHUNK // 2,
    )
    return out, (feat_t, slot_layout, slot_g, valid, n_touched, tile_start, tile_count, out)


def _blend_gathered_bwd(grid_w, grid_h, tile_size, source_cap, layout_chunk,
                        exact_alpha, freeze, stream8, res, g_out):
    """Backward: replay kernel -> per-instance grads [8, I_pad] -> reduce to
    per-gaussian [N, 16]: ONE value-sort keyed on slot_layout restores
    pre-sort (per-gaussian-contiguous) order, then segmented prefix sums
    (scatter-free; see ops.tiles.sort_rows_to_slot_order for the cost
    analysis). The bf16 color quantizer is straight-through.

    layout_chunk == 1 (compact layout) replays with the unaligned-start
    kernel variant, whose sequential boundary-chunk read-merge-write makes
    the chunk-aligned relayout unnecessary for training too."""
    from lichtfeld_studio_tpu.kernels.segment_reduce import grad_segment_reduce_packed
    from lichtfeld_studio_tpu.ops.tiles import sort_rows_to_slot_order

    feat_t, slot_layout, slot_g, valid, n_touched, tile_start, tile_count, out = res
    aligned = layout_chunk > 1
    dfeat_t = _backward_call(
        feat_t, tile_start, tile_count, out, g_out, grid_w, grid_h, tile_size,
        aligned=aligned, chunk=layout_chunk if aligned else CHUNK // 2,
    )
    i_pad = slot_layout.shape[0]
    cols = sort_rows_to_slot_order(
        [dfeat_t[k, :i_pad] for k in range(GRAD_ROWS)], slot_layout, valid,
        source_cap, slice_to_cap=False,
    )  # 8 x [i_pad] (colors bf16-paired in cols 6-7)
    # per-gaussian reduction + color unpack + pack_features layout in ONE
    # Pallas pass (membership MXU matmul, see kernels/segment_reduce);
    # the [16, N] feature-major cotangent matches pack_features_t
    dpacked_t = grad_segment_reduce_packed(
        cols, n_touched, source_cap, slot_g=slot_g
    )  # [16, N] (pack_features layout: 0-5 geometry, 8-11 colors)
    if stream8:
        # 8-row stream cotangent: colors re-paired for pack_colors_pair's
        # straight-through VJP to unpack
        dpacked_t = jnp.concatenate(
            [
                dpacked_t[0:6],
                pack_bf16_pair(dpacked_t[8], dpacked_t[9])[None, :],
                pack_bf16_pair(dpacked_t[10], dpacked_t[11])[None, :],
            ],
            axis=0,
        )
    return (dpacked_t, None, None, None, None, None, None)


_blend_gathered.defvjp(_blend_gathered_fwd, _blend_gathered_bwd)


def blend_pallas_fused(
    packed_t: jax.Array,  # [16, N] (ops.tiles.pack_features_t) or the
    #   direct [8, N] stream from pack_stream8 (production path)
    assignment,  # TileAssignment (chunk-aligned layout)
    n_touched: jax.Array,  # [N]
    *,
    grid_w: int,
    grid_h: int,
    tile_size: int = 16,
    n_channels: int = 3,
    exact_alpha: bool = True,
    freeze: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Gather + Pallas blend fused behind one custom VJP.
    Returns (image [grid_h*ts, grid_w*ts, C], alpha [grid_h*ts, grid_w*ts]).
    exact_alpha=False (inference) evaluates sigma2 with the 3-pass bf16
    split (~1e-3 worst-case alpha error, under the viewer's 1/255 step).
    freeze=False (inference only — NEVER differentiate) drops the per-pixel
    transmittance-freeze bookkeeping; see _forward_kernel."""
    out = _blend_gathered(
        packed_t,
        assignment.gaussian_idx,
        assignment.slot_layout,
        assignment.slot_gaussian,
        assignment.instance_valid,
        n_touched,
        (assignment.tile_start, assignment.tile_count),
        grid_w,
        grid_h,
        tile_size,
        assignment.source_cap,
        assignment.chunk,  # 1 = compact (inference) layout -> unaligned fwd
        exact_alpha,
        freeze,
        packed_t.shape[0] == 8,
    )
    ts = tile_size
    chans = out[:, 0:4, :].reshape(grid_h, grid_w, 4, ts, ts)
    image = chans.transpose(0, 3, 1, 4, 2).reshape(grid_h * ts, grid_w * ts, 4)[..., :n_channels]
    t_final = out[:, 4, :].reshape(grid_h, grid_w, ts, ts)
    alpha = 1.0 - t_final.transpose(0, 2, 1, 3).reshape(grid_h * ts, grid_w * ts)
    return image, alpha
