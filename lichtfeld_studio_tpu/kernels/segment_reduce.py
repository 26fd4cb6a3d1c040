"""Pallas TPU segment-sum over contiguous slot segments (gradient reduction).

Reduces per-instance gradient rows (pre-sort "slot" order, where every
gaussian's instances are contiguous) to per-gaussian sums. This replaces the
prefix-sum + boundary-gather construction (ops/tiles.py::
segment_sum_by_prefix) for wide rows: on v5e a [1M,10] boundary gather from
a [2.5M,10] prefix table costs ~27 ms (row widths > 8 fall off the fast
gather path) plus ~6 ms of cumsum, where this kernel runs ~12 ms total.

The kernel streams the rows once and reduces each BLOCK_N-gaussian output
block with an interval-membership matrix contracted on the MXU:

    m[n, j] = (slot_j >= off[n]) & (slot_j < off[n+1])   in {0.0, 1.0}
    out[n, :] = m[n, j] @ rows[:, j]^T

m is built from two monotone >= compares (off is non-decreasing), so the
whole reduction is compares + one [BN,IN]x[IN,C] matmul per streamed chunk
— no gather, no scatter, no sort. Reference semantics: the warp-atomic
per-gaussian gradient accumulation of fastgs kernels_backward.cuh,
re-derived for a systolic/vector machine.

Overhead design (the first cut of this kernel was grid-latency bound, not
compute bound — ~2000 programs each opening with a BLOCKING offsets DMA):
* per-block offsets are double-buffered ACROSS grid programs (grid programs
  run sequentially on the core; scratch persists), so program k's offsets
  were already in flight while program k-1 computed;
* the F gradient columns arrive as ONE stacked [F, cap] array — a single
  [F, IN] DMA per streamed chunk instead of F scalar-row DMAs;
* the membership matrix is materialized in bf16 ({0,1} exact) and the
  matmul runs as a 2-pass hi/lo split of the rows (f32-faithful final
  gradients at a third of HIGHEST's six passes).

`unpack_pairs=True` consumes the blend backward's native 8-row stream
(6 f32 geometry rows + 2 bf16-pair color words, kernels/blend_pallas.py)
and emits gradients directly in the 16-column pack_features layout
(cols 0-5 geometry, 8-11 colors), so the caller needs no unpack, restack,
or transpose at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 1024  # gaussians per output block
IN_CHUNK = 1024  # slots streamed per inner step
OFF_PAD = IN_CHUNK + BLOCK_N + 128  # slack past the last off entry


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _unpack_pair_rows(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One f32 row of bf16 pairs -> (hi, lo) f32 rows (see blend_pallas)."""
    b = jax.lax.bitcast_convert_type(w, jnp.int32)
    hi = jax.lax.bitcast_convert_type(b & ~0xFFFF, jnp.float32)
    lo = jax.lax.bitcast_convert_type(b << 16, jnp.float32)
    return hi, lo


def _bf16_split_rows(x):
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi = jax.lax.bitcast_convert_type(b & ~0xFFFF, jnp.float32)
    return hi, x - hi


def _segment_reduce_kernel(
    off_hbm,  # [1, NB*BN + OFF_PAD] int32 ANY — segment offsets (clipped)
    cols_hbm,  # [F(+1), cap_pad] f32 ANY — slot-ordered gradient rows
    #   (+ the slot->gaussian id row as exact f32 ints when use_slot_g)
    out_ref,  # out block VMEM
    off_v,  # scratch [2, 1, BN+128] int32 — double-buffered across programs
    col_s,  # scratch [2, F(+1), IN] f32
    osem,  # (2,) DMA semaphores (offsets)
    sem,  # (2,) DMA semaphores (columns)
    *,
    n_feat: int,
    out_cols: int,
    n_blocks: int,
    unpack_pairs: bool,
    feature_major_out: bool,
    use_slot_g: bool = False,
):
    k = pl.program_id(0)

    def off_dma(slot, kk):
        return pltpu.make_async_copy(
            off_hbm.at[:, pl.ds(kk * BLOCK_N, BLOCK_N + 128)],
            off_v.at[slot],
            osem.at[slot],
        )

    # cross-program pipeline: program 0 kicks off its own copy; everyone
    # prefetches the NEXT block's offsets before doing any work, then waits
    # on its own (already long in flight for k > 0)
    @pl.when(k == 0)
    def _():
        off_dma(0, 0).start()

    @pl.when(k + 1 < n_blocks)
    def _():
        off_dma((k + 1) % 2, k + 1).start()

    off_dma(k % 2, k).wait()
    off_lo = off_v[k % 2, 0, 0]
    off_end = off_v[k % 2, 0, BLOCK_N]
    base = pl.multiple_of((off_lo // IN_CHUNK) * IN_CHUNK, IN_CHUNK)
    n_chunks = pl.cdiv(off_end - base, IN_CHUNK)

    # off boundaries as a column for the membership compares: m[n, j]
    offs = off_v[k % 2, 0, :][:, None]  # [BN+128, 1]

    def dma(slot, t):
        return pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(base + t * IN_CHUNK, IN_CHUNK)],
            col_s.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    def body(t, acc):
        slot = t % 2

        @pl.when(t + 1 < n_chunks)
        def _():
            dma((t + 1) % 2, t + 1).start()

        dma(slot, t).wait()
        rows = col_s[slot]  # [F(+1), IN]
        if unpack_pairs:
            # blend backward stream -> pack_features 16-col layout
            r, g = _unpack_pair_rows(rows[6, :])
            b, aux = _unpack_pair_rows(rows[7, :])
            zero = jnp.zeros_like(r)
            rows_v = jnp.stack(
                [
                    rows[0, :], rows[1, :], rows[2, :], rows[3, :], rows[4, :],
                    rows[5, :], zero, zero, r, g, b, aux, zero, zero, zero, zero,
                ]
            )  # [16, IN]
        else:
            # the stacked array may carry a slot_g row and/or zero padding
            # to an 8-aligned row count — use only the real columns
            rows_v = rows[:n_feat]

        if use_slot_g:
            # membership by slot->gaussian EQUALITY: the expand kernel
            # already computed each slot's owning gaussian, so one [BN, IN]
            # compare replaces the interval construction's two monotone
            # compares over [BN+128, IN] plus a subtract (~40% fewer VPU
            # passes on the hot backward reduction). g rides the stacked
            # DMA as exact f32 integers (< 2^24); float equality on exact
            # ints is exact. Foreign slots (previous/next block, dead tail,
            # filler) simply fail the compare — no boundary cases.
            gs = rows[n_feat : n_feat + 1, :]  # [1, IN] f32 ints
            n_col = (
                k * BLOCK_N
                + jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, 1), 0)
            ).astype(jnp.float32)
            # one compare + one i1->bf16 convert — the same astype idiom the
            # interval path compiles with; a select against SCALAR bf16
            # operands instead trips Mosaic's "Invalid relayout ...
            # replicated in destination" on the i1 mask (measured)
            m = (gs == n_col).astype(jnp.bfloat16)  # [BN, IN]
            # {0,1} membership is EXACT in bf16, so a 2-pass hi/lo split of
            # the f32 rows yields f32-faithful gradient sums (vs 6-pass
            # HIGHEST); these are the FINAL per-gaussian gradients, where
            # bf16 rounding is the known 0.3 dB hazard.
        else:
            slot_ids = base + t * IN_CHUNK + jax.lax.broadcasted_iota(
                jnp.int32, (1, IN_CHUNK), 1
            )  # [1, IN]
            ge = (slot_ids >= offs).astype(jnp.bfloat16)  # [BN+128, IN]
            m = ge[:BLOCK_N, :] - ge[1 : BLOCK_N + 1, :]
        r_hi, r_lo = _bf16_split_rows(rows_v)
        if feature_major_out:
            dot = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            upd = dot(r_hi, m) + dot(r_lo, m)  # [C, BN]
        else:
            dot = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            upd = dot(m, r_hi) + dot(m, r_lo)  # [BN, C]
        return acc + upd

    acc_shape = (
        (out_cols, BLOCK_N) if feature_major_out else (BLOCK_N, out_cols)
    )
    acc = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros(acc_shape, jnp.float32))
    out_ref[...] = acc


def _segment_reduce_call(
    cols: list[jax.Array],  # F x [>= cap + IN_CHUNK] f32, invalid rows zeroed
    n_touched: jax.Array,  # [N] int32
    source_cap: int,
    out_cols: int,
    unpack_pairs: bool,
    feature_major_out: bool = False,
    slot_g: jax.Array | None = None,  # [source_cap] int32 slot->gaussian
) -> jax.Array:
    n = n_touched.shape[0]
    f = len(cols)
    nb = -(-n // BLOCK_N)
    ends = jnp.cumsum(n_touched)
    off = jnp.minimum(
        jnp.concatenate([jnp.zeros((1,), jnp.int32), ends.astype(jnp.int32)]),
        source_cap,
    )  # [N+1]
    off_pad = jnp.full((nb * BLOCK_N + OFF_PAD,), source_cap, jnp.int32)
    off_pad = jax.lax.dynamic_update_slice(off_pad, off, (0,))[None, :]

    # one stacked [F(+1), cap_pad] array -> ONE DMA per streamed chunk. chunk
    # DMAs read [base, base + k*IN_CHUNK) with base <= off <= cap and
    # end < cap + 2*IN_CHUNK. slot_g (if given) rides as one more row of
    # exact f32 integers for the kernel's equality membership; its 0.0 pad
    # can only fake-match gaussian 0 on rows whose cols are already zeroed.
    if slot_g is not None:
        cols = cols + [slot_g.astype(jnp.float32)]
    need = source_cap + 2 * IN_CHUNK
    width = max(need, cols[0].shape[0])
    stacked = jnp.stack(
        [jnp.pad(c, (0, width - c.shape[0])) if c.shape[0] < width else c
         for c in cols]
    )  # [F(+1), width]
    # Mosaic requires dim-0 DMA slices aligned to the (8, 128) f32 tiling:
    # pad the row count to a multiple of 8 (the g row makes it 9)
    n_rows = -(-stacked.shape[0] // 8) * 8
    if stacked.shape[0] != n_rows:
        stacked = jnp.pad(stacked, ((0, n_rows - stacked.shape[0]), (0, 0)))

    if feature_major_out:
        out_specs = pl.BlockSpec(
            (out_cols, BLOCK_N), lambda k: (0, k), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((out_cols, nb * BLOCK_N), jnp.float32)
    else:
        out_specs = pl.BlockSpec(
            (BLOCK_N, out_cols), lambda k: (k, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((nb * BLOCK_N, out_cols), jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _segment_reduce_kernel,
            n_feat=f,
            out_cols=out_cols,
            n_blocks=nb,
            unpack_pairs=unpack_pairs,
            feature_major_out=feature_major_out,
            use_slot_g=slot_g is not None,
        ),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 1, BLOCK_N + 128), jnp.int32),
            pltpu.VMEM((2, n_rows, IN_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(off_pad, stacked)
    return out[:, :n] if feature_major_out else out[:n]


def segment_reduce_cols(
    cols: list[jax.Array],  # F x [cap or longer] f32 — slot-ordered columns
    n_touched: jax.Array,  # [N] int32 — segment lengths (expansion counts)
    source_cap: int,
) -> jax.Array:
    """Per-gaussian sums of contiguous slot segments -> [N, F] f32.

    Segment n covers slots [off[n], off[n+1]) with off = exclusive cumsum of
    n_touched, clipped to source_cap (overflow-dropped instances contribute
    zero, matching the binning overflow policy). Column entries beyond
    source_cap are never read."""
    return _segment_reduce_call(list(cols), n_touched, source_cap, len(cols), False)


def grad_segment_reduce_packed(
    cols8: list[jax.Array],  # 8 x [cap or longer] f32 — blend bwd stream
    n_touched: jax.Array,  # [N] int32
    source_cap: int,
    slot_g: jax.Array | None = None,  # [source_cap] int32 slot->gaussian
) -> jax.Array:
    """Blend-backward gradient columns (slot order, packed stream layout:
    6 geometry + 2 bf16-pair color words) -> per-gaussian gradients [16, N],
    feature-major, directly in the pack_features_t row layout (0-5 geometry,
    8-11 colors, rest zero). slot_g (the expand kernel's slot->gaussian map)
    switches the kernel to the cheaper equality membership."""
    assert len(cols8) == 8
    return _segment_reduce_call(
        list(cols8), n_touched, source_cap, 16, True, feature_major_out=True,
        slot_g=slot_g,
    )
