"""Pallas TPU streaming EXACT world-space (3DGUT) blend — fwd + custom VJP.

TPU re-derivation of the reference's world-space rasterizer
(gsplat/RasterizeToPixelsFromWorld3DGSFwd.cu:20-442 and
RasterizeToPixelsFromWorld3DGSBwd.cu:17-561). The CUDA kernels stream
tile-batched gaussians through shared memory and re-evaluate the camera
model per pixel per gaussian; the backward accumulates with warp atomics.
This kernel keeps the dense oracle's math (ops/world_blend.py::_alphas_world)
but streams instance chunks exactly like the fast 2D blend
(kernels/blend_pallas.py) — double-buffered DMA, prefix-product
transmittance, early termination, moment-matmul backward, no atomics and
NO k_max truncation (the dense [T, K, P] fallback materializes tens of GB
at full resolution; this kernel's working set is a CHUNK slice).

The key identity making the streaming form cheap: for a GLOBAL-shutter
camera every pixel ray shares one origin, so with

    M   = diag(1/s) R^T            (per gaussian)
    gro = M (ray_o - mean)         (per gaussian — constant over pixels!)
    grd = M d(p)                   (d = per-pixel ray direction)

the squared min Mahalanobis distance along the ray is

    dist(p) = |C d|^2 / |M d|^2    with C = -skew(gro) M

evaluated LINEARLY on the MXU: y = C d and z = M d are six [3, CHUNK] x
[3, P] contractions per chunk against the tile's raw ray-direction rows,
then num = y1^2+y2^2+y3^2 and den likewise on the VPU. The earlier
quadratic-form variant (num = d^T (C^T C) d against a [dx^2 ... dydz]
basis) was measurably wrong at TRAINED statistics: expanding the square
moves the cancellation from sin(theta) to sin^2(theta), and for a gaussian
|gro| sigma-units from the camera the f32 G-entries lose the distance
entirely once |gro| >~ 1300 (selfcheck parity gate caught 2% of pixels off
by up to 0.25 on a converged model). The linear form cancels like the
reference's per-pixel cross product (Fwd.cu:228-241) — error ~2^-24/sin,
good to |gro| ~ 1e6 sigma. The per-gaussian C/M construction is [N]-wide
JAX (differentiable; the custom VJP boundary sits at the packed stream, so
autodiff carries dC/dM back to means/quats/scales automatically). Rolling
shutter keeps the form with a tau-affine origin model: C(tau) = C0 + tau C1
so y = y0 + tau y1 — see pack_world_stream_rs (exact slerp directions,
chordal origins).

Stream layout [24, I] (feature-major, instances on the lane axis):
  rows 0-8   C' = C / sqrt(2 ln2), row-major (the fold makes
             s = num/den + nlog2(op) exp2-ready, same trick as the 2D
             kernel's log2-unit thresholds)
  rows 9-17  M, row-major
  row  18    -log2(opacity)
  rows 19-21 spare (zeros)
  rows 22-23 colors as bf16 pairs (r|g, b|aux) — aux carries depth for the
             D/ED render modes.
Rolling shutter [32, I]: rows 0-8 C0', 9-17 C1', 18-26 M, 27 -log2(op),
rows 28-29 spare, 30-31 colors.

Per-tile ray basis [T, 8, P]: rows 0-2 the raw ray direction, row 3 ones
(the backward's plain-u moment rides the same stacked matmul), row 4 the
per-pixel shutter time tau (zeros for global), rows 5-7 zeros.

Backward writeback mirrors the stream layout (dC' / dM / d(nlog2op) /
dcolor pairs). Reduction to per-gaussian: the same slot-restore sort +
equality-membership segment reduce as the 2D path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lichtfeld_studio_tpu.kernels.blend_pallas import (
    CHUNK,
    IN_SLOTS,
    OUT_SLOTS,
    _bf16_split,
    _dot3,
    _interpret,
    _prefix_prod_rows,
    _prefix_sum_rows,
    pack_bf16_pair,
    unpack_bf16_pair,
)
from lichtfeld_studio_tpu.ops.projection import (
    MAX_FRAGMENT_ALPHA,
    MIN_ALPHA_THRESHOLD,
    TRANSMITTANCE_THRESHOLD,
)

STREAM_ROWS = 24
GRAD_ROWS = 24
# Rolling-shutter stream (see pack_world_stream_rs): rows 0-8 C0',
# 9-17 C1', 18-26 M, 27 -log2(op), 28-29 spare, 30-31 colors.
STREAM_ROWS_RS = 32
_LOG2_MIN_ALPHA = math.log2(MIN_ALPHA_THRESHOLD)
_LOG2_MAX_FRAGMENT = math.log2(MAX_FRAGMENT_ALPHA)
_LN2 = math.log(2.0)
_INV_SQRT_2LN2 = 1.0 / math.sqrt(2.0 * _LN2)


def _skew_rows(g):
    """[N, 3] -> skew(g) [N, 3, 3]."""
    gx, gy, gz = g[:, 0], g[:, 1], g[:, 2]
    zeros = jnp.zeros_like(gx)
    return jnp.stack(
        [
            jnp.stack([zeros, -gz, gy], -1),
            jnp.stack([gz, zeros, -gx], -1),
            jnp.stack([-gy, gx, zeros], -1),
        ],
        -2,
    )


def _rows9(a):
    """[N, 3, 3] -> [9, N] row-major."""
    return a.reshape(a.shape[0], 9).T


def pack_world_stream(
    means: jax.Array,  # [N, 3]
    log_scales: jax.Array,  # [N, 3]
    quats: jax.Array,  # [N, 4]
    opacity: jax.Array,  # [N] activated
    color: jax.Array,  # [N, 3]
    ray_o: jax.Array,  # [3] shared camera origin (GLOBAL shutter)
    depth: jax.Array | None = None,
) -> jax.Array:
    """Per-gaussian streamed features [24, N] (see module docstring).
    Pure JAX and differentiable — sits OUTSIDE the custom-VJP boundary, so
    d(C', M, op, colors) flow back to the raw parameters automatically.
    Math mirrors ops/world_blend.py::_alphas_world (Fwd.cu:207-241)."""
    n = means.shape[0]
    qn = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    inv_s = jnp.exp(-log_scales)  # [N, 3]
    from lichtfeld_studio_tpu.ops.gaussians import quat_to_rotmat

    rot = quat_to_rotmat(qn)  # [N, 3, 3]
    m = inv_s[:, :, None] * jnp.swapaxes(rot, -1, -2)  # [N, 3, 3] rows = 1/s_i * R[:, i]
    gro = jnp.einsum("nij,nj->ni", m, ray_o[None, :] - means, precision=jax.lax.Precision.HIGHEST)  # [N, 3]
    # C = -skew(gro) @ M  (cross(grd, gro) = -gro x grd = C d)
    c = -jnp.einsum("nij,njk->nik", _skew_rows(gro), m, precision=jax.lax.Precision.HIGHEST)
    nlog_op = -jnp.log2(jnp.maximum(opacity, 1e-12))[None, :]
    aux = depth if depth is not None else jnp.zeros((n,), means.dtype)
    colors = pack_colors_st(color[:, 0], color[:, 1], color[:, 2], aux)  # [2, N]
    return jnp.concatenate(
        [
            _rows9(c) * _INV_SQRT_2LN2,
            _rows9(m),
            nlog_op,
            jnp.zeros((3, n), means.dtype),
            colors,
        ],
        axis=0,
    )  # [24, N]


@jax.custom_vjp
def pack_colors_st(r, g, b, aux):
    """bf16-pair color packing with a STRAIGHT-THROUGH gradient: the
    backward kernel emits dcolor already bf16-paired in the same rows, and
    the VJP below unpacks them — the quantizer itself is identity-gradient
    (same convention as the 2D kernel's color stream)."""
    return jnp.stack([pack_bf16_pair(r, g), pack_bf16_pair(b, aux)])


def _pack_colors_st_fwd(r, g, b, aux):
    return pack_colors_st(r, g, b, aux), None


def _pack_colors_st_bwd(_, d):
    dr, dg = unpack_bf16_pair(d[0])
    db, daux = unpack_bf16_pair(d[1])
    return dr, dg, db, daux


pack_colors_st.defvjp(_pack_colors_st_fwd, _pack_colors_st_bwd)


def ray_dir_basis(
    rays_d: jax.Array,  # [Hp*Wp, 3] row-major pixel order (world_ray_table)
    grid_w: int,
    grid_h: int,
    tile_size: int,
    tau: jax.Array | None = None,  # [Hp*Wp] per-pixel shutter time
) -> jax.Array:
    """Per-tile ray-direction basis [T, 8, P]: rows 0-2 the raw direction
    [dx, dy, dz], row 3 ones, row 4 the per-pixel shutter time tau (rolling
    shutter; zeros for global), rows 5-7 zeros. The ratio
    dist = |C d|^2/|M d|^2 is scale-invariant in d, so the directions need
    no normalization."""
    ts = tile_size

    def tile_major(x):
        return (
            x.reshape(grid_h, ts, grid_w, ts, -1)
            .transpose(0, 2, 1, 3, 4)
            .reshape(grid_w * grid_h, ts * ts, -1)
        )

    t_p = tile_major(rays_d)  # [T, P, 3]
    dx, dy, dz = t_p[..., 0], t_p[..., 1], t_p[..., 2]
    ones = jnp.ones_like(dx)
    zeros = jnp.zeros_like(dx)
    tau_row = tile_major(tau[:, None])[..., 0] if tau is not None else zeros
    return jnp.stack(
        [dx, dy, dz, ones, tau_row, zeros, zeros, zeros], axis=1
    )  # [T, 8, P]


def pack_world_stream_rs(
    means: jax.Array,  # [N, 3]
    log_scales: jax.Array,  # [N, 3]
    quats: jax.Array,  # [N, 4]
    opacity: jax.Array,  # [N] activated
    color: jax.Array,  # [N, 3]
    o_start: jax.Array,  # [3] start-of-frame camera origin
    o_end: jax.Array,  # [3] end-of-frame camera origin
    depth: jax.Array | None = None,
) -> jax.Array:
    """Rolling-shutter streamed features [32, N].

    The shared-origin identity extends to a MOVING origin that is AFFINE in
    the per-pixel shutter time tau: with o(tau) = o_start + tau*v,
    gro(tau) = gro0 + tau*u (u = M v), so C(tau) = C0 + tau*C1 and the
    linear evaluation becomes y = (C0 d) + tau*(C1 d) — six [3,CHUNK]x[3,P]
    contractions plus per-pixel multiply-adds per chunk. The denominator
    |M d|^2 is pose-independent. Ray DIRECTIONS stay exact (per-scanline
    slerp pose, world_ray_table); only the ORIGIN path is chordal: the
    reference's slerp origin o(tau) deviates from the chord by
    <= |t| * theta^2 / 8 (theta = inter-pose rotation) — sub-pixel for any
    physical shutter, and EXACT for translation-only motion. Reference:
    per-pixel pose re-evaluation in gsplat/Cameras.cuh:253-413; the dense
    fallback (ops/world_blend.py) keeps exact per-pixel origins.

    Rows: 0-8 C0', 9-17 C1' (both 1/sqrt(2 ln2)-folded), 18-26 M,
    27 -log2(op), 28-29 spare, 30-31 colors (bf16 pairs)."""
    from lichtfeld_studio_tpu.ops.gaussians import quat_to_rotmat

    n = means.shape[0]
    qn = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    inv_s = jnp.exp(-log_scales)
    rot = quat_to_rotmat(qn)
    m = inv_s[:, :, None] * jnp.swapaxes(rot, -1, -2)  # [N, 3, 3]
    gro0 = jnp.einsum("nij,nj->ni", m, o_start[None, :] - means, precision=jax.lax.Precision.HIGHEST)
    u = jnp.einsum("nij,j->ni", m, o_end - o_start, precision=jax.lax.Precision.HIGHEST)
    c0 = -jnp.einsum("nij,njk->nik", _skew_rows(gro0), m, precision=jax.lax.Precision.HIGHEST)
    c1 = -jnp.einsum("nij,njk->nik", _skew_rows(u), m, precision=jax.lax.Precision.HIGHEST)
    rows = [
        _rows9(c0) * _INV_SQRT_2LN2,
        _rows9(c1) * _INV_SQRT_2LN2,
        _rows9(m),
        -jnp.log2(jnp.maximum(opacity, 1e-12))[None, :],
        jnp.zeros((2, n), means.dtype),
        pack_colors_st(
            color[:, 0], color[:, 1], color[:, 2],
            depth if depth is not None else jnp.zeros((n,), means.dtype),
        ),
    ]
    return jnp.concatenate(rows, axis=0)  # [32, N]


def _yz_world_mxu(f, basis, rs=False, tau=None, exact=True):
    """(y [3][CHUNK, P], z [3][CHUNK, P]) from the streamed rows + the
    tile's raw direction rows: y_k = (C' d)_k, z_k = (M d)_k — six (nine
    for rolling shutter) [3, CHUNK] x [3, P] contractions. LINEAR in d, so
    the cancellation behaves like the reference's per-pixel cross product
    (see module docstring)."""
    dims = (((0,), (0,)), ((), ()))
    d3 = jnp.stack([basis[0, :], basis[1, :], basis[2, :]])
    if exact:
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        dot = functools.partial(_dot3, dims=dims)

    def rows3(a):
        # explicit single-row stack instead of f[a:a+3]: multi-row slices of
        # the streamed block at non-8-aligned sublane offsets MISCOMPILE
        # under Mosaic (silent wrong operand rows; interpret mode and the
        # 2D kernel's single-row reads are fine) — see PERFNOTES r5
        return jnp.stack([f[a, :], f[a + 1, :], f[a + 2, :]])

    if rs:
        y = [
            dot(rows3(3 * k), d3) + tau * dot(rows3(9 + 3 * k), d3)
            for k in range(3)
        ]
        z = [dot(rows3(18 + 3 * k), d3) for k in range(3)]
    else:
        y = [dot(rows3(3 * k), d3) for k in range(3)]
        z = [dot(rows3(9 + 3 * k), d3) for k in range(3)]
    return y, z


def _alpha_world_mxu(f, basis, in_range, exact=True, rs=False, tau=None):
    """alpha [CHUNK, P] from the streamed rows + the tile's direction rows.
    s = (|C' d|^2)/(|M d|^2) + nlog2(op) (log2 units); alpha_raw = exp2(-s).
    Returns (alpha, s, nlog_op_col, y, z) — the backward reuses y/z for its
    moment contractions. Masks mirror the 2D kernel: keep iff
    alpha_raw >= 1/255 <=> s <= log2(255); out-of-range lanes fold into
    nlog_op (+1e10) so they fail the keep test with zero extra passes.
    dist >= 0 always (ratio of sums of squares), so the sigma2>=0 gate of
    the 2D kernel is vacuous here."""
    y, z = _yz_world_mxu(f, basis, rs=rs, tau=tau, exact=exact)
    num = y[0] * y[0] + y[1] * y[1] + y[2] * y[2]
    den = z[0] * z[0] + z[1] * z[1] + z[2] * z[2]
    op_row = 27 if rs else 18
    nlog_op = f[op_row, :] + jnp.where(in_range[0], 0.0, 1e10)  # [CHUNK]
    nlog_op_col = nlog_op[:, None]
    s = num / jnp.maximum(den, 1e-30) + nlog_op_col
    alpha = jnp.minimum(jnp.exp2(-s), MAX_FRAGMENT_ALPHA)
    keep = s <= -_LOG2_MIN_ALPHA
    return jnp.where(keep, alpha, 0.0), s, nlog_op_col, y, z


def _unpack_colors_w(f, rs=False):
    cr = 30 if rs else 22
    r, g = unpack_bf16_pair(f[cr, :])
    b, aux = unpack_bf16_pair(f[cr + 1, :])
    return jnp.stack([r, g, b, aux])


def _forward_kernel(
    tile_start_ref,
    tile_count_ref,
    feat_hbm,  # [16, I+pad] ANY
    basis_ref,  # [1, 8, P] VMEM — this tile's ray basis
    out_ref,  # [1, 8, P] VMEM
    feat_s,  # scratch [IN_SLOTS, 16|32, CHUNK]
    sem,
    *,
    tile_size: int,
    chunk: int,
    rs: bool = False,
):
    n_pix = tile_size * tile_size
    t = pl.program_id(0)
    # compact (unaligned) layout only — same convention as the 2D kernel's
    # aligned=False variant (DMA the aligned window, mask foreign lanes)
    count = tile_count_ref[t]
    start = tile_start_ref[t]
    off = jax.lax.rem(start, chunk)
    base = pl.multiple_of(start - off, chunk)
    end_rel = off + count
    n_chunks = pl.cdiv(end_rel, chunk)
    basis = basis_ref[0]  # [8, P]
    # rolling shutter: basis row 4 carries the tile's per-pixel shutter time
    tau = basis[4:5] if rs else None

    def dma(slot, ci):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(base + ci * chunk, chunk)],
            feat_s.at[slot],
            sem.at[slot],
        )

    for k in range(IN_SLOTS - 1):
        @pl.when(k < n_chunks)
        def _(k=k):
            dma(k, k).start()

    def cond(carry):
        ci, t_run, _ = carry
        return (ci < n_chunks) & (jnp.max(t_run) >= TRANSMITTANCE_THRESHOLD)

    def body(carry):
        ci, t_run, acc = carry
        slot = ci % IN_SLOTS

        @pl.when(ci + IN_SLOTS - 1 < n_chunks)
        def _():
            dma((ci + IN_SLOTS - 1) % IN_SLOTS, ci + IN_SLOTS - 1).start()

        dma(slot, ci).wait()
        f = feat_s[slot]  # [16|32, CHUNK]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        gi = ci * chunk + lane
        in_range = (gi >= off) & (gi < end_rel)
        alpha, _, _, _, _ = _alpha_world_mxu(
            f, basis, in_range, rs=rs, tau=tau
        )  # [CHUNK, P]

        prod_incl = _prefix_prod_rows(1.0 - alpha)
        p_incl = t_run * prod_incl
        t_before = jnp.concatenate([t_run, p_incl[: chunk - 1]], axis=0)
        counted = p_incl >= TRANSMITTANCE_THRESHOLD
        w = jnp.where(counted, t_before - p_incl, 0.0)

        colors = jnp.maximum(_unpack_colors_w(f, rs), 0.0)  # [4, CHUNK]
        colors5 = jnp.concatenate(
            [colors, jnp.ones((1, chunk), jnp.float32)], axis=0
        )
        dotc = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w_hi, w_lo = _bf16_split(w)
        acc = acc + dotc(colors5, w_hi) + dotc(colors5, w_lo)  # [5, P]

        return ci + 1, p_incl[chunk - 1 : chunk, :], acc

    ci_end, _, acc = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(0, jnp.int32),
            jnp.ones((1, n_pix), jnp.float32),
            jnp.zeros((5, n_pix), jnp.float32),
        ),
    )

    for j in range(IN_SLOTS - 1):
        @pl.when(ci_end + j < n_chunks)
        def _(j=j):
            dma((ci_end + j) % IN_SLOTS, ci_end + j).wait()

    out_ref[0, 0:4, :] = acc[0:4]
    out_ref[0, 4, :] = 1.0 - acc[4]  # telescoped frozen transmittance
    out_ref[0, 5:8, :] = jnp.zeros((3, n_pix), jnp.float32)


def _backward_kernel(
    tile_start_ref,
    tile_count_ref,
    feat_hbm,  # [16, I+pad] ANY
    basis_ref,  # [1, 8, P] VMEM
    gout_ref,  # [1, 8, P] VMEM — rows 0-3 channel cotangents, 4 dT, 5 CG_final
    tfin_ref,  # [1, 1, P] VMEM
    dfeat_hbm,  # out [16, I+pad] ANY
    feat_s,  # [IN_SLOTS, 16|32, CHUNK]
    dfeat_s,  # [OUT_SLOTS, 16|32, CHUNK]
    head_s,  # [16|32, CHUNK] boundary merge
    sem,
    outsem,
    headsem,
    *,
    tile_size: int,
    chunk: int,
    rs: bool = False,
):
    n_pix = tile_size * tile_size
    grad_rows = STREAM_ROWS_RS if rs else GRAD_ROWS
    t = pl.program_id(0)
    count = tile_count_ref[t]
    start = tile_start_ref[t]
    off = jax.lax.rem(start, chunk)
    base = pl.multiple_of(start - off, chunk)
    end_rel = off + count
    n_chunks = pl.cdiv(end_rel, chunk)
    basis = basis_ref[0]  # [8, P]
    tau = basis[4:5] if rs else None

    g_img = gout_ref[0, 0:4, :]
    g_tfin = gout_ref[0, 4, :][None, :]
    t_final = tfin_ref[0, 0, :][None, :]

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

    for k in range(IN_SLOTS - 1):
        @pl.when(k < n_chunks)
        def _(k=k):
            dma_in(k, k).start()

    @pl.when(n_chunks > 0)
    def _():
        dma_head_read().start()

    # r0 = CG_final + dT * T_final (loop-invariant; see the 2D kernel's
    # single-divide dalpha folding)
    r0 = gout_ref[0, 5, :][None, :] + g_tfin * t_final

    def cond(carry):
        ci, t_run, _ = carry
        return (ci < n_chunks) & (jnp.max(t_run) >= TRANSMITTANCE_THRESHOLD)

    def body(carry):
        ci, t_run, a_run = carry
        slot = ci % IN_SLOTS

        @pl.when(ci + IN_SLOTS - 1 < n_chunks)
        def _():
            dma_in((ci + IN_SLOTS - 1) % IN_SLOTS, ci + IN_SLOTS - 1).start()

        dma_in(slot, ci).wait()
        f = feat_s[slot]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        gi = ci * chunk + lane
        in_range = (gi >= off) & (gi < end_rel)
        alpha, s, nlog_op_col, yv, zv = _alpha_world_mxu(
            f, basis, in_range, rs=rs, tau=tau
        )

        prod_incl = _prefix_prod_rows(1.0 - alpha)
        p_incl = t_run * prod_incl
        counted = p_incl >= TRANSMITTANCE_THRESHOLD
        t_before = jnp.concatenate([t_run, p_incl[: chunk - 1]], axis=0)
        w = jnp.where(counted, t_before - p_incl, 0.0)

        raw_colors = _unpack_colors_w(f, rs)
        colors = jnp.maximum(raw_colors, 0.0)

        dcolor = jax.lax.dot_general(
            g_img, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [4, CHUNK]
        dcolor = jnp.where(raw_colors > 0.0, dcolor, 0.0)

        cg = jax.lax.dot_general(
            colors, g_img, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [CHUNK, P]

        wcg = w * cg
        a_incl = a_run + _prefix_sum_rows(wcg)

        # u = dL/d sigma2 (natural units, sigma2 = dist/2) — identical
        # algebra to the 2D backward (see kernels/blend_pallas.py)
        live = (s > -_LOG2_MAX_FRAGMENT) & counted
        u = jnp.where(
            live, (alpha / (1.0 - alpha)) * (r0 - a_incl) - wcg, 0.0
        )  # [CHUNK, P]

        # s = |C' d|^2/|M d|^2 + nlog2(op) (log2 units) gives
        #   dL/ds      = ln2 * u        (alpha = exp2(-s); u = -dL/dalpha*alpha)
        #   dL/dC'_kj  = sum_p 2*(ln2*u/den)*y_k*d_j       -> u1-moments
        #     (rolling shutter: dC0' <- 2*u1*y, dC1' <- 2*u1*y*tau)
        #   dL/dM_kj   = sum_p 2*(-ln2*u*sdist/den)*z_k*d_j -> u2-moments
        #   dL/dnlog2op = ln2 * sum_p u  (ones-row moment; the OUTER autodiff
        #     chains through -log2(op) — emitting dL/dop here would
        #     double-apply the chain rule)
        # den is recomputed from the replayed z (never streamed).
        den = zv[0] * zv[0] + zv[1] * zv[1] + zv[2] * zv[2]
        inv_den = 1.0 / jnp.maximum(den, 1e-30)
        sdist = s - nlog_op_col  # num/den, >= 0
        u1 = (2.0 * _LN2 * u) * inv_den
        u2 = -u1 * sdist
        # ONE stacked moment contraction: basis[0:4] [4, P] x [P, k*CHUNK]
        # (rows 0-2 = d, row 3 = ones)
        if rs:
            stacked = jnp.concatenate(
                [u1 * yv[0], u1 * yv[1], u1 * yv[2],
                 (u1 * tau) * yv[0], (u1 * tau) * yv[1], (u1 * tau) * yv[2],
                 u2 * zv[0], u2 * zv[1], u2 * zv[2], u],
                axis=0,
            )  # [10*CHUNK, P]
        else:
            stacked = jnp.concatenate(
                [u1 * yv[0], u1 * yv[1], u1 * yv[2],
                 u2 * zv[0], u2 * zv[1], u2 * zv[2], u],
                axis=0,
            )  # [7*CHUNK, P]
        mom = _dot3(basis[0:4], stacked, (((1,), (1,)), ((), ())))  # [4, kC]

        oslot = ci % OUT_SLOTS

        @pl.when(ci >= OUT_SLOTS)
        def _():
            dma_out(oslot, ci - OUT_SLOTS).wait()

        if rs:
            for k in range(3):  # dC0' rows 0-8, dC1' rows 9-17, dM 18-26
                for j in range(3):
                    dfeat_s[oslot, 3 * k + j, :] = mom[j, k * chunk:(k + 1) * chunk]
                    dfeat_s[oslot, 9 + 3 * k + j, :] = mom[j, (3 + k) * chunk:(4 + k) * chunk]
                    dfeat_s[oslot, 18 + 3 * k + j, :] = mom[j, (6 + k) * chunk:(7 + k) * chunk]
            dfeat_s[oslot, 27, :] = _LN2 * mom[3, 9 * chunk : 10 * chunk]
            dfeat_s[oslot, 28:30, :] = jnp.zeros((2, chunk), jnp.float32)
            dfeat_s[oslot, 30, :] = pack_bf16_pair(dcolor[0], dcolor[1])
            dfeat_s[oslot, 31, :] = pack_bf16_pair(dcolor[2], dcolor[3])
        else:
            for k in range(3):  # dC' rows 0-8, dM rows 9-17
                for j in range(3):
                    dfeat_s[oslot, 3 * k + j, :] = mom[j, k * chunk:(k + 1) * chunk]
                    dfeat_s[oslot, 9 + 3 * k + j, :] = mom[j, (3 + k) * chunk:(4 + k) * chunk]
            dfeat_s[oslot, 18, :] = _LN2 * mom[3, 6 * chunk : 7 * chunk]
            dfeat_s[oslot, 19:22, :] = jnp.zeros((3, chunk), jnp.float32)
            dfeat_s[oslot, 22, :] = pack_bf16_pair(dcolor[0], dcolor[1])
            dfeat_s[oslot, 23, :] = pack_bf16_pair(dcolor[2], dcolor[3])

        # boundary head merge (sequential grid programs — see the 2D kernel)
        @pl.when(ci == 0)
        def _():
            dma_head_read().wait()
            lane_row = jax.lax.broadcasted_iota(jnp.int32, (grad_rows, chunk), 1)
            dfeat_s[oslot] = jnp.where(lane_row >= off, dfeat_s[oslot], head_s[...])

        dma_out(oslot, ci).start()
        a_new = a_incl[chunk - 1 : chunk, :]
        return ci + 1, p_incl[chunk - 1 : chunk, :], a_new

    ci_end, _, _ = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(0, jnp.int32),
            jnp.ones((1, n_pix), jnp.float32),
            jnp.zeros((1, n_pix), jnp.float32),
        ),
    )

    for j in range(IN_SLOTS - 1):
        @pl.when(ci_end + j < n_chunks)
        def _(j=j):
            dma_in((ci_end + j) % IN_SLOTS, ci_end + j).wait()

    def zbody(ci):
        oslot = ci % OUT_SLOTS

        @pl.when(ci >= OUT_SLOTS)
        def _():
            dma_out(oslot, ci - OUT_SLOTS).wait()

        dfeat_s[oslot, :, :] = jnp.zeros((grad_rows, chunk), jnp.float32)
        dma_out(oslot, ci).start()
        return ci + 1

    jax.lax.while_loop(lambda ci: ci < n_chunks, zbody, ci_end)

    for j in range(1, OUT_SLOTS + 1):
        @pl.when(n_chunks >= j)
        def _(j=j):
            dma_out((n_chunks - j) % OUT_SLOTS, n_chunks - j).wait()


def _forward_call(feat_t, basis, tile_start, tile_count, num_tiles, tile_size, chunk):
    n_pix = tile_size * tile_size
    rs = feat_t.shape[0] == STREAM_ROWS_RS
    kernel = functools.partial(
        _forward_kernel, tile_size=tile_size, chunk=chunk, rs=rs
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 8, n_pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, n_pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((IN_SLOTS, feat_t.shape[0], chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((IN_SLOTS,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, n_pix), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(tile_start, tile_count, feat_t, basis)


def _backward_call(
    feat_t, basis, tile_start, tile_count, out, g_out, num_tiles, tile_size, chunk
):
    n_pix = tile_size * tile_size
    rs = feat_t.shape[0] == STREAM_ROWS_RS
    grad_rows = feat_t.shape[0]
    cg_final = jnp.sum(out[:, 0:4, :] * g_out[:, 0:4, :], axis=1, keepdims=True)
    g_aug = jnp.concatenate(
        [g_out[:, 0:5, :], cg_final, jnp.zeros_like(g_out[:, 6:8, :])], axis=1
    )
    t_final = out[:, 4:5, :]
    kernel = functools.partial(
        _backward_kernel, tile_size=tile_size, chunk=chunk, rs=rs
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 8, n_pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, n_pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((IN_SLOTS, feat_t.shape[0], chunk), jnp.float32),
                pltpu.VMEM((OUT_SLOTS, grad_rows, chunk), jnp.float32),
                pltpu.VMEM((grad_rows, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((IN_SLOTS,)),
                pltpu.SemaphoreType.DMA((OUT_SLOTS,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((grad_rows, feat_t.shape[1]), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True
        ),
        interpret=_interpret(),
    )(tile_start, tile_count, feat_t, basis, g_aug, t_final)


def _gather_stream(stream16, g_pad, valid):
    gathered = jnp.where(valid[None, :], jnp.take(stream16, g_pad, axis=1), 0.0)
    i = gathered.shape[1]
    pad = (-i) % CHUNK + CHUNK
    return jnp.pad(gathered, ((0, 0), (0, pad)))


def world_blend_pallas(
    stream16: jax.Array,  # [16, N] (pack_world_stream) or [32, N] (_rs)
    rays_d: jax.Array,  # [Hp*Wp, 3]
    assignment,  # TileAssignment (compact layout, chunk == 1)
    n_touched: jax.Array,
    *,
    grid_w: int,
    grid_h: int,
    tile_size: int,
    n_channels: int = 3,
    tau: jax.Array | None = None,  # [Hp*Wp] shutter times (rolling only)
) -> tuple[jax.Array, jax.Array]:
    """Streaming exact world-space blend. Returns (image [Hp, Wp, C],
    alpha [Hp, Wp]). GLOBAL shutter only (the shared-ray-origin identity);
    Rolling shutter: pass a [32, N] stream (pack_world_stream_rs) plus the
    per-pixel shutter times `tau` — the kernel evaluates the tau-polynomial
    numerator (see pack_world_stream_rs). No k_max truncation — every
    counted instance blends exactly."""
    assert assignment.chunk == 1, "world blend streams the compact layout"
    rs = stream16.shape[0] == STREAM_ROWS_RS
    assert (tau is not None) == rs, "tau required iff the stream is 32-row"
    num_tiles = grid_w * grid_h
    basis = ray_dir_basis(rays_d, grid_w, grid_h, tile_size, tau=tau)
    out = _world_blend_gathered2(
        stream16,
        basis,
        assignment.gaussian_idx,
        assignment.slot_layout,
        assignment.slot_gaussian,
        assignment.instance_valid,
        n_touched,
        (assignment.tile_start, assignment.tile_count),
        num_tiles,
        tile_size,
        assignment.source_cap,
        CHUNK // 2,
    )
    ts = tile_size
    chans = out[:, 0:4, :].reshape(grid_h, grid_w, 4, ts, ts)
    image = chans.transpose(0, 3, 1, 4, 2).reshape(grid_h * ts, grid_w * ts, 4)[..., :n_channels]
    t_final = out[:, 4, :].reshape(grid_h, grid_w, ts, ts)
    alpha = 1.0 - t_final.transpose(0, 2, 1, 3).reshape(grid_h * ts, grid_w * ts)
    return image, alpha


# --- gather + kernels behind one custom VJP (mirrors blend_pallas.py's
# _blend_gathered; the backward reduces per-instance grads to per-gaussian
# with the slot-restore sort + interval-membership segment reduce instead of
# the reference's warp atomics, Bwd.cu:17-561) -----------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _world_blend_gathered2(
    stream16, basis, g_pad, slot_layout, slot_g, valid, n_touched,
    tile_counts_pair,
    num_tiles, tile_size, source_cap, chunk,
):
    tile_start, tile_count = tile_counts_pair
    feat_t = _gather_stream(stream16, g_pad, valid)
    return _forward_call(
        feat_t, basis, tile_start, tile_count, num_tiles, tile_size, chunk
    )


def _world_fwd2(
    stream16, basis, g_pad, slot_layout, slot_g, valid, n_touched,
    tile_counts_pair,
    num_tiles, tile_size, source_cap, chunk,
):
    tile_start, tile_count = tile_counts_pair
    feat_t = _gather_stream(stream16, g_pad, valid)
    out = _forward_call(
        feat_t, basis, tile_start, tile_count, num_tiles, tile_size, chunk
    )
    return out, (feat_t, basis, slot_layout, slot_g, valid, n_touched, tile_start, tile_count, out)


def _world_bwd2(num_tiles, tile_size, source_cap, chunk, res, g_out):
    from lichtfeld_studio_tpu.kernels.segment_reduce import _segment_reduce_call
    from lichtfeld_studio_tpu.ops.tiles import sort_rows_to_slot_order

    feat_t, basis, slot_layout, slot_g, valid, n_touched, tile_start, tile_count, out = res
    dfeat_t = _backward_call(
        feat_t, basis, tile_start, tile_count, out, g_out,
        num_tiles, tile_size, chunk,
    )
    rows = feat_t.shape[0]  # 16 (global) or 32 (rolling shutter)
    cr = rows - 2  # first color-pair row
    i_pad = slot_layout.shape[0]
    cols = sort_rows_to_slot_order(
        [dfeat_t[k, :i_pad] for k in range(rows)], slot_layout, valid,
        source_cap, slice_to_cap=False,
    )  # rows x [i_pad]; the last two are bf16-paired color words
    # dstream feature-major, colors still PAIRED in the last two rows —
    # summing packed words is meaningless, so unpack them into their
    # 4 plain columns BEFORE the reduce, then re-pack via the straight-
    # through quantizer's convention (pack_colors_st's VJP unpacks them).
    dr, dg = unpack_bf16_pair(cols[cr])
    db, daux = unpack_bf16_pair(cols[cr + 1])
    plain = cols[0:cr] + [dr, dg, db, daux]  # rows+2 columns
    red = _segment_reduce_call(
        plain, n_touched, source_cap, len(plain), False, feature_major_out=True,
        slot_g=slot_g,
    )  # [rows+2, N]
    dstream = jnp.concatenate(
        [
            red[0:cr],
            pack_bf16_pair(red[cr], red[cr + 1])[None, :],
            pack_bf16_pair(red[cr + 2], red[cr + 3])[None, :],
        ],
        axis=0,
    )  # [rows, N]
    return (dstream, None, None, None, None, None, None, None)


_world_blend_gathered2.defvjp(_world_fwd2, _world_bwd2)
