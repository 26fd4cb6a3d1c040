"""Pallas TPU instance expansion: slot -> (owning gaussian, rank, payload).

Replaces the scatter-marker + prefix-sum + payload-gather construction in
ops/tiles.py::build_tile_assignment. On v5e at the bench geometry (1M-cap
model, 1.5M instance cap) that construction costs ~15 ms/step: the XLA TPU
scatter is a ~9 ns/update scalar loop (8.8 ms), the [4, C] -> [4, I]
monotone payload gather another ~6.5 ms (gathers pay per ROW, ~4.3 ns,
regardless of how sequential the indices are). This kernel produces the
same outputs for ~5 ms of sort+cumsum prep and ~1-2 ms of kernel time.

Construction (reference semantics: duplicateWithKeys of fastgs
rasterization/src/forward.cu:103-147, which binary-searches the offset
array per instance — cheap on a gather machine, wrong shape for a vector
machine):

1. Compaction sort: nonzero segments move to the front in original order
   (single int32 key = idx | empty << 30; the payload words ride as sort
   values). Segment start offsets become STRICTLY increasing on the live
   prefix, so a contiguous window of K+2 sorted entries covers every owner
   of K consecutive slots — without compaction, runs of culled gaussians
   share one offset and no window bound exists.
2. off = exclusive cumsum of compacted counts; per-256-slot-chunk window
   starts via searchsorted with I/256 queries (TPU searchsorted is slow
   per QUERY, and this needs 8k queries, not 1.5M).
3. Kernel: each program owns 8192 slots = 32 chunks of 256; ONE [8, 8448]
   window DMA per program (window starts advance <= 1 entry per slot),
   double-buffered across programs; each chunk takes a 128-aligned VMEM
   slice of it and computes
       onehot[s, j] = (w[j] <= s) & (w[j+1] > s)
   — exactly one hit per covered slot (w strictly increasing on live
   segments; duplicate runs exist only in the dead tail, where the rank
   test invalidates the slot anyway) — then contracts the window's bytes
   against the one-hot on the MXU:  out = bytes[24, W] @ onehot[256, W]^T.
   bf16 {0..255} x {0,1} products with a single term per column are exact.

Outputs match the XLA construction exactly on valid slots
(tests/test_expand_pallas.py); invalid slots return in-bounds garbage with
rank >= n_touched[g], which every caller masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FINE = 256  # slots per inner chunk (one window / one-hot matmul each)
N_INNER = 32  # inner chunks per grid program
PROG = FINE * N_INNER  # slots per grid program
WCMP = 384  # window entries compared/contracted per chunk: owner span of 256
#             slots is <= 257 entries, +127 for 128-aligned starts
WSLC = 512  # in-VMEM slice width per chunk (>= WCMP + 1 for the w[j+1] read)
# one window DMA per PROGRAM: starts advance <= 1 entry/slot, so all 32
# chunk windows live in [win[first], win[first] + 7936 + WSLC)
W_PROG = PROG - FINE + WSLC  # = 8448, 128-aligned
_EMPTY_BIT = 1 << 30
_BIG = 1 << 30  # off padding: larger than any slot id


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _expand_kernel(
    prog_ref,  # scalar prefetch [n_prog] int32 — per-program window base
    rel_ref,  # scalar prefetch [n_chunks] int32 — chunk offset into window
    stk_hbm,  # [8, C_pad] int32 ANY — (off, orig, w0..w3) compacted columns
    g_ref,  # out [1, N_INNER, FINE] int32 — owning gaussian (original index)
    rank_ref,  # out — rank within segment
    q0_ref,  # out — payload word 0
    q1_ref,
    q2_ref,
    q3_ref,
    stv,  # scratch [2, 8, W_PROG] int32 (8 rows: DMA dim-0 tiling alignment)
    sem,  # (2,) DMA semaphores
    *,
    n_prog: int,
):
    k = pl.program_id(0)

    def dma(slot, kk):
        return pltpu.make_async_copy(
            stk_hbm.at[:, pl.ds(pl.multiple_of(prog_ref[kk], 128), W_PROG)],
            stv.at[slot],
            sem.at[slot],
        )

    # cross-program DMA pipeline: ONE window DMA per program (32 inner
    # chunks slice it in VMEM), prefetched a program ahead — per-chunk DMAs
    # were latency-bound (~1.4 us x 6k chunks)
    @pl.when(k == 0)
    def _():
        dma(0, 0).start()

    @pl.when(k + 1 < n_prog)
    def _():
        dma((k + 1) % 2, k + 1).start()

    dma(k % 2, k).wait()

    def body(t, carry):
        idx = k * N_INNER + t
        rel = pl.multiple_of(rel_ref[idx], 128)
        st = stv[k % 2, :, pl.ds(rel, WSLC)]  # [8, WSLC] (rows 6-7 zero pad)

        base = k * PROG + t * FINE
        s_col = base + jax.lax.broadcasted_iota(jnp.int32, (FINE, 1), 0)
        w_row = st[0:1, 0:WCMP]  # segment starts (strictly increasing, live)
        wn_row = st[0:1, 1 : WCMP + 1]
        # one-hot as arithmetic {0,1} int32 (broadcast compares produce i1
        # layouts Mosaic can't relayout — PERFNOTES mask rules):
        # a = [w <= s], an = [w_next <= s], a - an = [w <= s < w_next].
        # NB: the fewer-pass clamp(min(s-w+1, wn-s), 0, 1) form miscompiles
        # on Mosaic (multi-hit garbage at scale); keep the two-clamp form.
        one = jnp.int32(1)
        zero = jnp.int32(0)
        a = jnp.minimum(jnp.maximum(s_col - w_row + 1, zero), one)
        an = jnp.minimum(jnp.maximum(s_col - wn_row + 1, zero), one)
        oh = (a - an).astype(jnp.bfloat16)  # [FINE, WCMP], <=1 hit per row

        # window bytes as bf16 (ints <= 255 are exact in bf16)
        sl = st[:, 0:WCMP]  # [8, WCMP]
        b = jnp.concatenate(
            [((sl >> sh) & 0xFF).astype(jnp.bfloat16) for sh in (0, 8, 16, 24)],
            axis=0,
        )  # [32, WCMP]; rows i+8*h = byte h of column i (rows 6,7 junk)
        out32 = jax.lax.dot_general(
            b, oh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [32, FINE] — exact: one term per column
        o = out32.astype(jnp.int32)

        def word(i):
            return (
                o[i : i + 1]
                | (o[i + 8 : i + 9] << 8)
                | (o[i + 16 : i + 17] << 16)
                | (o[i + 24 : i + 25] << 24)
            )  # [1, FINE]

        off_own = word(0)
        s_row = base + jax.lax.broadcasted_iota(jnp.int32, (1, FINE), 1)
        g_ref[0, t] = word(1)[0]
        rank_ref[0, t] = (s_row - off_own)[0]
        q0_ref[0, t] = word(2)[0]
        q1_ref[0, t] = word(3)[0]
        q2_ref[0, t] = word(4)[0]
        q3_ref[0, t] = word(5)[0]
        return carry

    jax.lax.fori_loop(0, N_INNER, body, 0)


def expand_instances(
    n_touched: jax.Array,  # [C] int32 — instances per gaussian (0 = culled)
    payload_t: jax.Array,  # [4, C] int32 — per-gaussian packed words
    instance_cap: int,
    counts_bits: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Expand per-gaussian segments to per-slot (g, rank, payload).

    Slot s of the instance buffer belongs to gaussian g with in-segment
    rank r, where segments are laid out consecutively in gaussian order
    (exclusive-cumsum offsets). Returns (g [I], rank [I], pl_t [4, I]),
    I = instance_cap. pl_t[:, s] == payload_t[:, g[s]]. Slots not covered
    by any live segment get in-bounds garbage with rank >= n_touched[g] —
    callers must mask with (slot < total) & (rank < counts-from-payload).

    counts_bits: if set, payload word 1 packs n_touched at that bit
    (w1 = low_bits | n_touched << counts_bits, tiles.py layout) and the
    counts are recovered from the riding payload instead of carrying
    n_touched as a 6th sort operand (one less [C] column through the
    compaction sort).
    """
    c = n_touched.shape[0]
    idx = jnp.arange(c, dtype=jnp.int32)
    key = jnp.where(n_touched > 0, idx, idx | _EMPTY_BIT)
    if counts_bits is None:
        ks, nt_s, p0, p1, p2, p3 = jax.lax.sort(
            (key, n_touched, payload_t[0], payload_t[1], payload_t[2],
             payload_t[3]),
            dimension=0,
            num_keys=1,
            is_stable=False,
        )
        nt_s = jnp.where(ks < _EMPTY_BIT, nt_s, 0)
    else:
        ks, p0, p1, p2, p3 = jax.lax.sort(
            (key, payload_t[0], payload_t[1], payload_t[2], payload_t[3]),
            dimension=0,
            num_keys=1,
            is_stable=False,
        )
        # empties pack 0 at counts_bits by construction (their w1 low bits
        # are a bbox width < 1 << counts_bits)
        nt_s = p1 >> counts_bits
    orig = ks & (_EMPTY_BIT - 1)
    off_c = (jnp.cumsum(nt_s) - nt_s).astype(jnp.int32)

    pad0 = jnp.zeros((W_PROG,), jnp.int32)
    zrow = jnp.zeros((c + W_PROG,), jnp.int32)
    stk = jnp.stack(
        [
            jnp.concatenate([off_c, jnp.full((W_PROG,), _BIG, jnp.int32)]),
            jnp.concatenate([orig, pad0]),
            jnp.concatenate([p0, pad0]),
            jnp.concatenate([p1, pad0]),
            jnp.concatenate([p2, pad0]),
            jnp.concatenate([p3, pad0]),
            zrow,
            zrow,
        ]
    )  # [8, C + W_PROG] (8 rows so DMA slices stay dim-0 tile-aligned)

    i_pad = -(-instance_cap // PROG) * PROG
    n_prog = i_pad // PROG
    n_chunks = i_pad // FINE
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * FINE
    win = jnp.clip(
        jnp.searchsorted(off_c, bases, side="right").astype(jnp.int32) - 1,
        0,
        c,  # stk has c + W_PROG columns, so [win, win+W_PROG) stays in bounds
    )
    # DMA/slice lane offsets must be 128-aligned on TPU; the <=127-entry
    # left shift is absorbed by WCMP (owner span <= 257, 257+127 < 384).
    # win is nondecreasing and advances <= 1/slot, so every chunk's window
    # sits within [win_prog, win_prog + W_PROG) of its program's DMA.
    win = (win // 128) * 128
    win_prog = win[:: N_INNER]  # [n_prog]
    rel = win - jnp.repeat(win_prog, N_INNER)  # [n_chunks], 128-multiples
    # The <= 7936 rel bound holds only while windows advance through LIVE
    # entries (strictly increasing off). Once a chunk's base passes the
    # last live slot, searchsorted lands at the END of the dead duplicate
    # run — an arbitrarily large jump. Those chunks contain no valid slot
    # (rank >= count everywhere), so any in-bounds window works: clamp.
    rel = jnp.minimum(rel, W_PROG - WSLC)

    out_sds = jax.ShapeDtypeStruct((n_prog, N_INNER, FINE), jnp.int32)
    spec = pl.BlockSpec((1, N_INNER, FINE), lambda k, *_: (k, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_expand_kernel, n_prog=n_prog),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_prog,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[spec] * 6,
            scratch_shapes=[
                pltpu.VMEM((2, 8, W_PROG), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[out_sds] * 6,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(win_prog, rel, stk)
    g, rank, q0, q1, q2, q3 = (x.reshape(i_pad)[:instance_cap] for x in outs)
    pl_t = jnp.stack([q0, q1, q2, q3])
    return g, rank, pl_t
