"""Pallas TPU pileup kernel.

The XLA pileup scatters ~N*L 4-channel rows into the window counters — a
giant serialized scatter. This kernel exploits structure the scatter can't
see:

1. Reads are position-sorted and (fast path) gapless, so each read's
   contribution is one contiguous slab at its start offset.
2. Lane alignment: rows are pre-shifted by pos % 128 (prealign_reads), so a
   read's slab offset is always a multiple of 128.
3. Within a window tile, reads fall into at most K = (T+LP)/128 distinct
   aligned offsets, and reads sharing an offset form a CONTIGUOUS row range
   (they're sorted). Each grid step (tile, k) DMAs one such group, reduces
   it over rows with plain vector ops (no dynamic row indexing, which
   Mosaic can't lane-align), and accumulates at a statically-128-aligned
   VMEM offset.
4. The kernel counts per-parity per-base-code columns (12 counters/column),
   which need no reference lookups; the reference-dependent channel math
   (meth/unmeth/opposite/variant, extract.c:420-441) runs as cheap XLA
   window ops afterwards — bit-identical to ops.semantics.pileup_channels.

Reads with indels or pathological coverage skew take the exact XLA scatter
path; the combined result is identical (tests/test_pallas_kernel.py).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BASE_A, BASE_C, BASE_G, BASE_T, BASE_N = 1, 2, 4, 8, 15
REF_C, REF_G = ord("C"), ord("G")

# Counter sublane layout: parity-major, then total/A/C/G/T/N
CH_TOTAL, CH_A, CH_C, CH_G, CH_T, CH_N = range(6)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def prealign_reads(seq, qual, pos_rel, strand):
    """Host-side phase alignment: shift row r right by pos_rel[r] % 128 so
    its first base sits at a lane-aligned window coordinate."""
    N, L = seq.shape
    LP2 = _round_up(L + 127, 128)
    pad = (pos_rel % 128).astype(np.int64)
    aligned = (pos_rel - pad).astype(np.int64)
    seq_a = np.zeros((N, LP2), np.uint8)
    qual_a = np.zeros((N, LP2), np.uint8)
    rows = np.arange(N)[:, None]
    cols = pad[:, None] + np.arange(L)[None, :]
    parity = (np.asarray(strand).astype(np.uint8) & 1)
    # Parity rides in bit 5 of every base byte (codes use only 4 bits), so
    # the kernel needs no separate per-read metadata array (whose narrow
    # lane width Mosaic cannot tile).
    seq_a[rows, cols] = seq | (parity[:, None] << 5)
    qual_a[rows, cols] = qual
    return seq_a, qual_a, aligned, parity


def _kernel(srtk_ref, cntk_ref, seq_hbm, qual_hbm, out_ref,
            seq_v, qual_v, acc, sems, *, T, HALO_L, LP, LP2, K, GMAX,
            min_phred):
    """One grid step = one window tile; the K offset-groups are processed by
    an unrolled in-kernel loop with double-buffered DMAs."""
    t = pl.program_id(0)

    def group_dma(k, slot):
        srt = srtk_ref[t * K + k]
        # DMA row offsets must be tile-aligned (u8 tiling 32): round down
        # and mask the leading remainder rows instead.
        base = pl.multiple_of((srt // 32) * 32, 32)
        cs = pltpu.make_async_copy(seq_hbm.at[pl.ds(base, GMAX)],
                                   seq_v.at[slot], sems.at[slot, 0])
        cq = pltpu.make_async_copy(qual_hbm.at[pl.ds(base, GMAX)],
                                   qual_v.at[slot], sems.at[slot, 1])
        return cs, cq

    cs0, cq0 = group_dma(0, 0)
    cs0.start()
    cq0.start()
    acc[...] = jnp.zeros_like(acc)

    for k in range(K):
        slot = k % 2
        if k + 1 < K:
            csn, cqn = group_dma(k + 1, (k + 1) % 2)
            csn.start()
            cqn.start()
        cs, cq = group_dma(k, slot)
        cs.wait()
        cq.wait()

        srt = srtk_ref[t * K + k]
        gcnt = cntk_ref[t * K + k]
        rem = srt - (srt // 32) * 32

        s_all = seq_v[slot].astype(jnp.int32)
        q = qual_v[slot].astype(jnp.int32)  # u8 compares unsupported on TPU
        s = s_all & 15            # base code
        odd_i = (s_all >> 5) & 1  # per-element parity (bit 5, set by prealign)
        # Mask algebra in int32: Mosaic cannot relayout broadcast i1 vectors.
        rowid = jax.lax.broadcasted_iota(jnp.int32, (GMAX, 1), 0)
        rowmask = ((rowid >= rem) & (rowid < rem + gcnt)).astype(jnp.int32)
        passing = (q >= min_phred).astype(jnp.int32) * rowmask  # [GMAX, LP2]
        # Parity packed into bit 16: one reduction yields odd count (high
        # half) and total (low half) at once — halves the reduction passes.
        # Group counts are bounded by GMAX ≤ 4096, so no carry between
        # halves and no i32 overflow (4096 + 4096<<16 < 2^31).
        enc = passing * (1 + (odd_i << 16))

        rows = [jnp.sum(enc, axis=0, keepdims=True)]  # total
        for code in (BASE_A, BASE_C, BASE_G, BASE_T, BASE_N):
            rows.append(jnp.sum(enc * (s == code).astype(jnp.int32),
                                axis=0, keepdims=True))
        packed = jnp.concatenate(rows, axis=0)       # [6, LP2]
        odd_block = packed >> 16
        even_block = (packed & 0xFFFF) - odd_block
        zero = jnp.zeros((4, LP2), jnp.int32)
        chan = jnp.concatenate([odd_block, even_block, zero], axis=0)

        off = pl.multiple_of((HALO_L - LP) + k * 128, 128)
        acc[:, pl.ds(off, LP2)] += chan

    out_ref[...] = acc[:, HALO_L : HALO_L + T]


@functools.partial(
    jax.jit,
    static_argnames=("ntiles", "T", "HALO_L", "LP", "LP2", "K", "GMAX", "min_phred"),
)
def _pileup_tiles(srtk, cntk, seq, qual, *, ntiles, T, HALO_L, LP, LP2, K,
                  GMAX, min_phred):
    # Parity packing bound: a packed per-column sum can reach
    # GMAX*(1 + 2^16), which must stay below 2^31 (int32) with no carry
    # from the low half into the high half (low half < 2^16).
    assert GMAX * (1 + (1 << 16)) < 2**31, (
        "parity packing needs GMAX*(1+2^16) < 2^31")
    tplus = T + HALO_L + LP2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (16, T), lambda t, *_: (0, t), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, GMAX, LP2), jnp.uint8),
            pltpu.VMEM((2, GMAX, LP2), jnp.uint8),
            pltpu.VMEM((16, tplus), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_kernel, T=T, HALO_L=HALO_L, LP=LP, LP2=LP2,
                               K=K, GMAX=GMAX, min_phred=min_phred)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, ntiles * T), jnp.int32),
    )(srtk, cntk, seq, qual)


def _kernel_nq(srtk_ref, cntk_ref, seq_hbm, out_ref, seq_v, acc, sems, *,
               T, HALO_L, LP, LP2, K, GMAX):
    """Qual-free variant of _kernel for PRE-GATED reads: the host has
    already zeroed the base code of every base failing the phred gate
    (and arbitration ran on host), so activity is simply `code != 0` —
    no qual array at all, halving the kernel's DMA traffic and VMEM
    footprint. Semantics otherwise identical to _kernel (and to
    ops.semantics.pileup_channels; parity-tested)."""
    t = pl.program_id(0)

    def group_dma(k, slot):
        srt = srtk_ref[t * K + k]
        base = pl.multiple_of((srt // 32) * 32, 32)
        return pltpu.make_async_copy(seq_hbm.at[pl.ds(base, GMAX)],
                                     seq_v.at[slot], sems.at[slot])

    group_dma(0, 0).start()
    acc[...] = jnp.zeros_like(acc)

    for k in range(K):
        slot = k % 2
        if k + 1 < K:
            group_dma(k + 1, (k + 1) % 2).start()
        group_dma(k, slot).wait()

        srt = srtk_ref[t * K + k]
        gcnt = cntk_ref[t * K + k]
        rem = srt - (srt // 32) * 32

        s_all = seq_v[slot].astype(jnp.int32)
        s = s_all & 15            # base code; 0 = pre-gated/pad (inert)
        odd_i = (s_all >> 5) & 1  # per-element parity (bit 5)
        rowid = jax.lax.broadcasted_iota(jnp.int32, (GMAX, 1), 0)
        rowmask = ((rowid >= rem) & (rowid < rem + gcnt)).astype(jnp.int32)
        passing = (s != 0).astype(jnp.int32) * rowmask
        enc = passing * (1 + (odd_i << 16))

        rows = [jnp.sum(enc, axis=0, keepdims=True)]  # total
        for code in (BASE_A, BASE_C, BASE_G, BASE_T, BASE_N):
            rows.append(jnp.sum(enc * (s == code).astype(jnp.int32),
                                axis=0, keepdims=True))
        packed = jnp.concatenate(rows, axis=0)       # [6, LP2]
        odd_block = packed >> 16
        even_block = (packed & 0xFFFF) - odd_block
        zero = jnp.zeros((4, LP2), jnp.int32)
        chan = jnp.concatenate([odd_block, even_block, zero], axis=0)

        off = pl.multiple_of((HALO_L - LP) + k * 128, 128)
        acc[:, pl.ds(off, LP2)] += chan

    out_ref[...] = acc[:, HALO_L : HALO_L + T]


@functools.partial(
    jax.jit,
    static_argnames=("ntiles", "T", "HALO_L", "LP", "LP2", "K", "GMAX"),
)
def _pileup_tiles_nq(srtk, cntk, seq, *, ntiles, T, HALO_L, LP, LP2, K, GMAX):
    assert GMAX * (1 + (1 << 16)) < 2**31, (
        "parity packing needs GMAX*(1+2^16) < 2^31")
    tplus = T + HALO_L + LP2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (16, T), lambda t, *_: (0, t), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, GMAX, LP2), jnp.uint8),
            pltpu.VMEM((16, tplus), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_nq, T=T, HALO_L=HALO_L, LP=LP,
                               LP2=LP2, K=K, GMAX=GMAX)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, ntiles * T), jnp.int32),
    )(srtk, cntk, seq)


def _pileup_tiles_nq_interpret(srtk, cntk, seq, *, ntiles, T, HALO_L, LP,
                               LP2, K):
    """CPU execution of the pre-gated kernel math (for parity tests)."""
    out = np.zeros((ntiles, 16, T), np.int32)
    for t in range(ntiles):
        acc = np.zeros((16, T + HALO_L + LP2), np.int32)
        for k in range(K):
            srt = int(srtk[t * K + k])
            gcnt = int(cntk[t * K + k])
            off = (HALO_L - LP) + k * 128
            for c in range(gcnt):
                r = srt + c
                s_all = seq[r].astype(np.int32)
                s = s_all & 15
                odd = (s_all >> 5) & 1
                passing = (s != 0).astype(np.int32)
                for par_val, base in ((1, 0), (0, 6)):
                    pm = passing * (odd == par_val)
                    acc[base + CH_TOTAL, off : off + LP2] += pm
                    for j, code in enumerate((BASE_A, BASE_C, BASE_G, BASE_T, BASE_N)):
                        acc[base + 1 + j, off : off + LP2] += pm * (s == code)
        out[t] = acc[:, HALO_L : HALO_L + T]
    return out


def _kernel_nq2(srtk_ref, cntk_ref, seq_hbm, out_ref, seq_v, acc, sems, *,
                T, HALO_L, LP, LP2, K, GMAX):
    """2-bit-code variant of _kernel_nq for the default (NCH=2) extract
    windows: the host encodes each pre-gated base SEMANTICALLY — 1 = the
    strand's methylated base (C on OT-side rows, G on OB-side), 2 = the
    unmethylated base (T / A), 0 = everything else — so only two counters
    per parity exist and the uploaded codes pack 4 bases/byte. Output rows:
    [odd_meth, odd_unmeth, even_meth, even_unmeth, 0...]."""
    t = pl.program_id(0)

    def group_dma(k, slot):
        srt = srtk_ref[t * K + k]
        base = pl.multiple_of((srt // 32) * 32, 32)
        return pltpu.make_async_copy(seq_hbm.at[pl.ds(base, GMAX)],
                                     seq_v.at[slot], sems.at[slot])

    group_dma(0, 0).start()
    acc[...] = jnp.zeros_like(acc)

    for k in range(K):
        slot = k % 2
        if k + 1 < K:
            group_dma(k + 1, (k + 1) % 2).start()
        group_dma(k, slot).wait()

        srt = srtk_ref[t * K + k]
        gcnt = cntk_ref[t * K + k]
        rem = srt - (srt // 32) * 32

        s_all = seq_v[slot].astype(jnp.int32)
        s = s_all & 15
        odd_i = (s_all >> 5) & 1
        rowid = jax.lax.broadcasted_iota(jnp.int32, (GMAX, 1), 0)
        rowmask = ((rowid >= rem) & (rowid < rem + gcnt)).astype(jnp.int32)
        enc = rowmask * (1 + (odd_i << 16))

        meth = jnp.sum(enc * (s == 1).astype(jnp.int32), axis=0,
                       keepdims=True)
        unmeth = jnp.sum(enc * (s == 2).astype(jnp.int32), axis=0,
                         keepdims=True)
        packed = jnp.concatenate([meth, unmeth], axis=0)  # [2, LP2]
        odd_block = packed >> 16
        even_block = (packed & 0xFFFF) - odd_block
        zero = jnp.zeros((4, LP2), jnp.int32)
        chan = jnp.concatenate([odd_block, even_block, zero], axis=0)

        off = pl.multiple_of((HALO_L - LP) + k * 128, 128)
        acc[:, pl.ds(off, LP2)] += chan

    out_ref[...] = acc[:, HALO_L : HALO_L + T]


@functools.partial(
    jax.jit,
    static_argnames=("ntiles", "T", "HALO_L", "LP", "LP2", "K", "GMAX"),
)
def _pileup_tiles_nq2(srtk, cntk, seq, *, ntiles, T, HALO_L, LP, LP2, K,
                      GMAX):
    assert GMAX * (1 + (1 << 16)) < 2**31
    tplus = T + HALO_L + LP2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (8, T), lambda t, *_: (0, t), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, GMAX, LP2), jnp.uint8),
            pltpu.VMEM((8, tplus), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_nq2, T=T, HALO_L=HALO_L, LP=LP,
                               LP2=LP2, K=K, GMAX=GMAX)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, ntiles * T), jnp.int32),
    )(srtk, cntk, seq)


def _pileup_tiles_nq2_interpret(srtk, cntk, seq, *, ntiles, T, HALO_L, LP,
                                LP2, K):
    """CPU execution of the 2-bit kernel math (for parity tests)."""
    out = np.zeros((ntiles, 8, T), np.int32)
    for t in range(ntiles):
        acc = np.zeros((8, T + HALO_L + LP2), np.int32)
        for k in range(K):
            srt = int(srtk[t * K + k])
            gcnt = int(cntk[t * K + k])
            off = (HALO_L - LP) + k * 128
            for c in range(gcnt):
                r = srt + c
                s_all = seq[r].astype(np.int32)
                s = s_all & 15
                odd = (s_all >> 5) & 1
                for par_val, base in ((1, 0), (0, 2)):
                    pm = (odd == par_val).astype(np.int32)
                    acc[base + 0, off : off + LP2] += pm * (s == 1)
                    acc[base + 1, off : off + LP2] += pm * (s == 2)
        out[t] = acc[:, HALO_L : HALO_L + T]
    return out


def unpack_bits_device(packed, W):
    """[ceil(W/8)] packed bits (np.packbits big-endian order) → bool [W]."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[:, None] >> shifts[None, :]) & 1
    return bits.reshape(-1)[:W] != 0


def channels_nch2(counts, isc_bits, isg_bits, W):
    """Epilogue for the 2-bit semantic coding: counts [8, W] from
    _pileup_tiles_nq2 (rows odd_meth/odd_unmeth/even_meth/even_unmeth) +
    host-packed per-window-coordinate reference masks → [2, W] uint32
    (meth, unmeth). The host already applied the window/ref frame shift
    when packing isc/isg, so no dynamic slicing happens on device."""
    counts = jnp.asarray(counts)
    is_c = unpack_bits_device(isc_bits, W)
    is_g = unpack_bits_device(isg_bits, W)
    meth = jnp.where(is_c, counts[0], jnp.where(is_g, counts[2], 0))
    unmeth = jnp.where(is_c, counts[1], jnp.where(is_g, counts[3], 0))
    return jnp.stack([meth, unmeth], axis=0).astype(jnp.uint32)


def counts_to_channels(counts, ref_window, win_offset_rel, W):
    """XLA epilogue: 12 per-parity base counts → the 4 reference-dependent
    channels of extract.c:420-441 (meth, unmeth, opposite coverage,
    opposite variants). counts: [16, W] (sublane-major, straight from the
    kernel — no transpose on the hot path)."""
    counts = jnp.asarray(counts)  # [16, W]
    ref = jnp.asarray(ref_window)
    # refb[i] = ref[i - win_offset_rel] (0 outside) — the index map is
    # contiguous, so a dynamic_slice of a zero-padded ref replaces a
    # W-element gather (6x on TPU: the gather ran at ~5 GB/s). PAD bounds
    # |win_offset_rel|: the engine fetches ref from win_start-2, so the
    # offset is a small negative number (extract.c:379-381's localPos2-2).
    PAD = 512
    if isinstance(win_offset_rel, int):
        # dynamic_slice clamps out-of-range starts silently; offsets beyond
        # the pad would silently misalign the reference. The engine fetches
        # ref from win_start-2, so |offset| is tiny; guard the assumption
        # whenever the offset is concrete (traced callers assert host-side
        # in _fused_dispatch).
        assert -(ref.shape[0] + PAD) <= win_offset_rel <= PAD, win_offset_rel
    padded = jnp.concatenate([jnp.zeros(PAD, ref.dtype), ref,
                              jnp.zeros(W + PAD, ref.dtype)])
    refb = jax.lax.dynamic_slice(padded, (PAD - win_offset_rel,), (W,))
    odd = counts[0:6]
    even = counts[6:12]
    is_c = refb == REF_C
    is_g = refb == REF_G
    meth = jnp.where(is_c, odd[1 + 1], jnp.where(is_g, even[1 + 2], 0))
    unmeth = jnp.where(is_c, odd[1 + 3], jnp.where(is_g, even[1 + 0], 0))
    var_odd = odd[CH_TOTAL] - odd[1 + 2] - odd[CH_N]
    var_even = even[CH_TOTAL] - even[1 + 1] - even[CH_N]
    off = jnp.where(is_c, even[CH_TOTAL],
                    jnp.where(is_g, odd[CH_TOTAL],
                              odd[CH_TOTAL] + even[CH_TOTAL]))
    var = jnp.where(is_c, var_even,
                    jnp.where(is_g, var_odd, var_odd + var_even))
    return jnp.stack([meth, unmeth, off, var], axis=0).astype(jnp.uint32)


def pileup_pallas(seq, qual, pos_rel, strand, ref_window, win_offset_rel, W,
                  min_phred=5, T=512, interpret=False, max_gmax=4096,
                  prealigned=None):
    """Fast-path pileup for gapless, position-sorted reads. Returns uint32
    [W, 4], bit-equal to ops.semantics.pileup_channels, or None if the
    batch's coverage skew exceeds max_gmax (caller falls back to XLA).
    `prealigned=(seq_a, qual_a, aligned)` skips prealign_reads (e.g. when
    quals were already arbitrated in the aligned layout)."""
    N, L = seq.shape
    pos_rel = np.asarray(pos_rel, np.int64)
    LP = _round_up(max(L, 128), 128)
    LP2 = _round_up(L + 127, 128)
    HALO_L = LP + 128
    wpad = _round_up(W, T)
    ntiles = wpad // T
    K = (T + LP) // 128

    if prealigned is not None:
        seq_a, qual_a, aligned = prealigned
        LP2 = seq_a.shape[1]
    else:
        seq_a, qual_a, aligned, parity = prealign_reads(seq, qual, pos_rel, strand)

    # Group boundaries: for tile t, groups at aligned offsets
    # t*T - LP + 128*k, k in [0, K)
    bounds = (np.arange(ntiles)[:, None] * T - LP + 128 * np.arange(K + 1)[None, :])
    flat = np.searchsorted(aligned, bounds.reshape(-1), side="left")
    flat = flat.reshape(ntiles, K + 1)
    srtk = flat[:, :K].astype(np.int32).reshape(-1)
    cntk = np.diff(flat, axis=1).astype(np.int32).reshape(-1)
    gmax = int(cntk.max()) if len(cntk) else 0
    # +32: group starts are rounded down to a 32-row boundary in-kernel.
    # Bucket to powers of two so repeated windows reuse the compiled kernel.
    GMAX = 64
    while GMAX < gmax + 32:
        GMAX *= 2
    if GMAX > max_gmax:
        return None

    # Row-count bucketing (powers of two) for jit-cache reuse across windows
    n_bucket = 256
    while n_bucket < N + GMAX:
        n_bucket *= 2
    pad_rows = n_bucket - N
    seq_a = np.concatenate([seq_a, np.zeros((pad_rows, LP2), np.uint8)])
    qual_a = np.concatenate([qual_a, np.zeros((pad_rows, LP2), np.uint8)])

    if interpret:
        tiles = _pileup_tiles_interpret(srtk, cntk, seq_a, qual_a,
                                        ntiles=ntiles, T=T, HALO_L=HALO_L,
                                        LP=LP, LP2=LP2, K=K,
                                        min_phred=min_phred)
        counts = tiles.transpose(1, 0, 2).reshape(16, wpad)[:, :W]
        out = counts_to_channels(counts, np.asarray(ref_window),
                                 win_offset_rel, W)
        return np.asarray(out).T.astype(np.uint32)

    tiles = _pileup_tiles(srtk, cntk, jnp.asarray(seq_a), jnp.asarray(qual_a),
                          ntiles=ntiles, T=T, HALO_L=HALO_L,
                          LP=LP, LP2=LP2, K=K, GMAX=GMAX, min_phred=min_phred)
    out = counts_to_channels(tiles[:, :W], jnp.asarray(ref_window),
                             win_offset_rel, W)
    return np.ascontiguousarray(np.asarray(jax.device_get(out)).T)


def _pileup_tiles_interpret(srtk, cntk, seq, qual, *, ntiles, T, HALO_L,
                            LP, LP2, K, min_phred):
    out = np.zeros((ntiles, 16, T), np.int32)
    for t in range(ntiles):
        acc = np.zeros((16, T + HALO_L + LP2), np.int32)
        for k in range(K):
            srt = int(srtk[t * K + k])
            gcnt = int(cntk[t * K + k])
            off = (HALO_L - LP) + k * 128
            for c in range(gcnt):
                r = srt + c
                s_all = seq[r].astype(np.int32)
                s = s_all & 15
                odd = (s_all >> 5) & 1
                q = qual[r]
                passing = (q >= min_phred).astype(np.int32)
                for par_val, base in ((1, 0), (0, 6)):
                    pm = passing * (odd == par_val)
                    acc[base + CH_TOTAL, off : off + LP2] += pm
                    for j, code in enumerate((BASE_A, BASE_C, BASE_G, BASE_T, BASE_N)):
                        acc[base + 1 + j, off : off + LP2] += pm * (s == code)
        out[t] = acc[:, HALO_L : HALO_L + T]
    return out
