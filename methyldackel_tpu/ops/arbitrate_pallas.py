"""Pallas mate-overlap arbitration kernel.

Operates on the phase-aligned split-mate layout: mates a/b in separate
[P, LP2] arrays (prealign_reads rows deinterleaved), where b's aligned
start differs from a's by sh*128 with sh in {0..2} for short reads. The
per-pair shift code (3 = ineligible pair) rides in bits 6-7 of every byte
of a's seq row, so the kernel needs no narrow per-pair metadata array.

For each static shift the C arbitration rules (overlaps.c:54-119) are
evaluated as vector selects and the per-pair variant chosen by mask —
everything stays in VMEM, no HBM intermediates, no gathers (the 1.2x
quality boost is q + q//5, exhaustively equal to the C's double-math
table).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BASE_N = 15


def _arb_kernel(sa_ref, qa_ref, sb_ref, qb_ref, oa_ref, ob_ref, *, LP2, max_shift):
    sa = sa_ref[...].astype(jnp.int32)
    qa = qa_ref[...].astype(jnp.int32)
    sb = sb_ref[...].astype(jnp.int32)
    qb = qb_ref[...].astype(jnp.int32)
    ba = sa & 15
    bbase = sb & 15
    sh = (sa >> 6) & 3

    def boost(q):
        return (q + q // 5) & 0xFF

    na = qa
    nb = qb
    col = jax.lax.broadcasted_iota(jnp.int32, qa.shape, 1)
    for s in range(max_shift + 1):
        off = s * 128
        if off >= LP2:
            break
        if off:
            zpad = jnp.zeros_like(bbase[:, :off])
            bb_s = jnp.concatenate([zpad, bbase[:, : LP2 - off]], axis=1)
            qb_s = jnp.concatenate([zpad, qb[:, : LP2 - off]], axis=1)
        else:
            bb_s = bbase
            qb_s = qb
        # Only positions covered by BOTH mates are shared (overlaps.c walks
        # the common span). Pad bytes are base-code 0, which no real base
        # uses, so (ba != 0) & (bb_s != 0) is exactly "both aligned here" —
        # without it an N base (qual > 0) facing a pad hits the zero_d rule
        # and is wrongly zeroed.
        hasv = (ba != 0) & (bb_s != 0)
        differ = ba != bb_s
        awins_d = differ & (qa > qb_s) & (ba != BASE_N)
        bwins_d = differ & ~awins_d & (qb_s > qa) & (bb_s != BASE_N)
        zero_d = differ & ~awins_d & ~bwins_d
        awins_s = ~differ & (qa > qb_s)
        bwins_s = ~differ & ~awins_s
        na_s = jnp.where(
            awins_d, qa - qb_s,
            jnp.where(awins_s, boost(qa),
                      jnp.where(bwins_d | bwins_s | zero_d, 0, qa)),
        )
        nbal = jnp.where(
            bwins_d, qb_s - qa,
            jnp.where(bwins_s, boost(qb_s),
                      jnp.where(awins_d | awins_s | zero_d, 0, qb_s)),
        )
        na_s = jnp.where(hasv, na_s, qa)
        nbal = jnp.where(hasv, nbal, qb_s)
        if off:
            zpad2 = jnp.zeros_like(nbal[:, :off])
            nb_s = jnp.concatenate([nbal[:, off:], zpad2], axis=1)
            nb_s = jnp.where(col < LP2 - off, nb_s, qb)
        else:
            nb_s = nbal
        mask = sh == s
        na = jnp.where(mask, na_s, na)
        nb = jnp.where(mask, nb_s, nb)

    oa_ref[...] = na.astype(jnp.uint8)
    ob_ref[...] = nb.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("PB", "LP2", "max_shift"))
def arbitrate_pallas(sa, qa, sb, qb, *, PB, LP2, max_shift):
    """sa/qa/sb/qb: [P, LP2] uint8 (P % PB == 0); sa carries the shift code
    in bits 6-7. Returns (new_qa, new_qb)."""
    P = sa.shape[0]
    grid = (P // PB,)
    spec = pl.BlockSpec((PB, LP2), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_arb_kernel, LP2=LP2, max_shift=max_shift)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((P, LP2), jnp.uint8),
            jax.ShapeDtypeStruct((P, LP2), jnp.uint8),
        ),
    )(sa, qa, sb, qb)


def prepare_pairs(seq_a, qual_a, aligned, strand, flag, max_shift):
    """Split an adjacent-mate prealigned batch into the kernel's layout.

    Returns (sa, qa, sb, qb, P) with the shift code packed into sa bits 6-7
    (3 = ineligible: strand parity mismatch, unpaired, or shift out of
    range — the C skips those pairs, overlaps.c:65,128)."""
    N, LP2 = seq_a.shape
    P = N // 2
    sa = seq_a[0::2].copy()
    sb = seq_a[1::2]
    qa = qual_a[0::2]
    qb = qual_a[1::2]
    ap = aligned.reshape(P, 2)
    sh = (ap[:, 1] - ap[:, 0]) // 128
    st2 = strand.reshape(P, 2).astype(np.int64)
    fl2 = flag.reshape(P, 2).astype(np.int64)
    eligible = (
        (((st2[:, 0] - st2[:, 1]) & 1) == 0)
        & ((fl2[:, 0] & 0x1) != 0) & ((fl2[:, 0] & 12) == 0)
        & ((fl2[:, 1] & 0x1) != 0) & ((fl2[:, 1] & 12) == 0)
        & (sh >= 0) & (sh <= max_shift)
    )
    code = np.where(eligible, sh, 3).astype(np.uint8)
    sa |= (code[:, None] << 6)
    return sa, qa, sb, qb, P
