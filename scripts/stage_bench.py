#!/usr/bin/env python
"""Per-stage device timing of the fused window program.

AXON GOTCHA (measured): dispatches AND compiles are fire-and-forget;
block_until_ready returns before remote completion. The only reliable sync
is a readback (device_get). Every timing here therefore ends with an
8-byte scalar readback, and each stage program returns a tiny checksum in
addition to its payload. The axon client content-caches uploads, so reusing
the same numpy buffers makes warm-iteration upload ~free and the scalar
readback isolates compute.

Run on the TPU in background: python scripts/stage_bench.py [n_pairs] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from methyldackel_tpu.utils.simulate import random_reference, simulate_batch_fast
    from methyldackel_tpu.ops import semantics as sem
    from methyldackel_tpu.parallel import enable_persistent_cache
    from methyldackel_tpu.parallel import device as dev
    from methyldackel_tpu.config import Config

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import functools

    rng = np.random.default_rng(0)
    W = 1 << 20
    L = 150
    ref_ascii, _codes = random_reference(rng, W + 64)
    batch = simulate_batch_fast(rng, _codes, n_pairs, L)
    cfg = Config()
    cfg.chunkSize = W
    st = sem.strand(batch.flag, batch.xg).astype(np.int32)

    # ---- replicate _fused_dispatch's host prep (bench window: all gapless)
    n = batch.n
    a_np = np.arange(0, n, 2, dtype=np.int64)
    b_np = a_np + 1
    W_fixed = dev._round_up(W + 16, 512)
    LP = dev._round_up(max(L, 128), 128)
    LP2 = dev._round_up(L + 127, 128)
    T = 512
    HALO_L = LP + 128
    wpad = dev._round_up(W_fixed, T)
    ntiles = wpad // T
    K = (T + LP) // 128

    f_pos = batch.pos.copy()
    aligned = f_pos - (f_pos % 128)
    order = np.argsort(aligned, kind="stable")
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    f_seq = batch.seq[order]
    f_qual = batch.qual[order]
    f_pos = f_pos[order]
    f_st = st[order]
    al_s = aligned[order]

    bounds = (np.arange(ntiles)[:, None] * T - LP
              + 128 * np.arange(K + 1)[None, :])
    flat = np.searchsorted(al_s, bounds.reshape(-1), side="left")
    flat = flat.reshape(ntiles, K + 1)
    srtk = flat[:, :K].astype(np.int32).reshape(-1)
    cntk = np.diff(flat, axis=1).astype(np.int32).reshape(-1)
    gmax = int(cntk.max())
    GMAX = 64
    while GMAX < gmax + 32:
        GMAX *= 2

    Nb = 256
    while Nb < n + GMAX:
        Nb *= 2
    seq_p = np.zeros((Nb, L), np.uint8)
    qual_p = np.zeros((Nb, L), np.uint8)
    pos_p = np.zeros(Nb, np.int32)
    parity_p = np.zeros(Nb, np.uint8)
    seq_p[:n] = f_seq
    qual_p[:n] = f_qual
    pos_p[:n] = f_pos
    parity_p[:n] = (f_st & 1).astype(np.uint8)

    pa_f = inv[a_np]
    pb_f = inv[b_np]
    swap = al_s[pa_f] > al_s[pb_f]
    pa2 = np.where(swap, pb_f, pa_f)
    pb2 = np.where(swap, pa_f, pb_f)
    sh = (al_s[pb2] - al_s[pa2]) // 128
    elig = (((f_st[pa2] - f_st[pb2]) & 1) == 0) & (sh >= 0) & (sh <= 2)
    code = np.where(elig, sh, 3).astype(np.uint8)
    PB = 256
    P = len(pa2)
    P_pad = PB
    while P_pad < P:
        P_pad *= 2
    pa_p = np.full(P_pad, Nb - 1, np.int32)
    pb_p = np.full(P_pad, Nb - 1, np.int32)
    code_p = np.full(P_pad, 3, np.uint8)
    pa_p[:P] = pa2
    pb_p[:P] = pb2
    code_p[:P] = code
    final_src = np.arange(Nb, dtype=np.int32)
    final_src[pa2] = Nb + np.arange(P, dtype=np.int32)
    final_src[pb2] = Nb + P_pad + np.arange(P, dtype=np.int32)

    ref_static = wpad + 256
    ref_p = np.zeros(ref_static, np.uint8)
    seqlen = min(len(ref_ascii), ref_static)
    ref_p[:seqlen] = np.asarray(ref_ascii[:seqlen], np.uint8)
    woff_rel = 0
    rb = ref_p[:wpad]
    cand = np.nonzero((rb == ord("C")) | (rb == ord("G")))[0].astype(np.int32)
    nc = len(cand)
    nc_pad = 512
    while nc_pad < nc:
        nc_pad *= 2
    cand_p = np.zeros(nc_pad, np.int32)
    cand_p[:nc] = cand

    from methyldackel_tpu.ops import arbitrate_pallas as ak
    from methyldackel_tpu.ops import pileup_pallas as pk

    statics = dict(LP2=LP2, PB=PB, max_shift=2, ntiles=ntiles, T=T,
                   HALO_L=HALO_L, LP=LP, K=K, GMAX=GMAX,
                   min_phred=cfg.minPhred, W=wpad)

    def chk(x):
        # tiny forced-sync payload: whole-array checksum, 8-byte readback
        return jnp.sum(x.astype(jnp.uint32) if x.dtype == jnp.uint8 else
                       x.astype(jnp.int32), dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("LP2",))
    def stage_b(seq, qual, pos_rel, parity, *, LP2):
        sa, qa = dev._phase_align_device(seq, qual, pos_rel, parity, LP2=LP2)
        return chk(sa) + chk(qa)

    @functools.partial(jax.jit, static_argnames=("LP2", "PB", "max_shift"))
    def stage_c(seq, qual, pos_rel, parity, pa, pb, code, *, LP2, PB, max_shift):
        seq_a, qual_a = dev._phase_align_device(seq, qual, pos_rel, parity, LP2=LP2)
        sa = seq_a[pa] | (code[:, None] << 6)
        na, nb = ak.arbitrate_pallas(sa, qual_a[pa], seq_a[pb], qual_a[pb],
                                     PB=PB, LP2=LP2, max_shift=max_shift)
        return chk(na) + chk(nb)

    @functools.partial(jax.jit, static_argnames=("LP2", "PB", "max_shift"))
    def stage_d(seq, qual, pos_rel, parity, pa, pb, code, final_src, *,
                LP2, PB, max_shift):
        seq_a, qual_a = dev._phase_align_device(seq, qual, pos_rel, parity, LP2=LP2)
        sa = seq_a[pa] | (code[:, None] << 6)
        na, nb = ak.arbitrate_pallas(sa, qual_a[pa], seq_a[pb], qual_a[pb],
                                     PB=PB, LP2=LP2, max_shift=max_shift)
        qual_a = jnp.take(jnp.concatenate([qual_a, na, nb], axis=0), final_src,
                          axis=0)
        return chk(seq_a) + chk(qual_a)

    @functools.partial(jax.jit, static_argnames=tuple(statics))
    def stage_e(seq, qual, pos_rel, parity, pa, pb, code, final_src, srtk,
                cntk, *, LP2, PB, max_shift, ntiles, T, HALO_L, LP, K, GMAX,
                min_phred, W):
        seq_a, qual_a = dev._phase_align_device(seq, qual, pos_rel, parity, LP2=LP2)
        sa = seq_a[pa] | (code[:, None] << 6)
        na, nb = ak.arbitrate_pallas(sa, qual_a[pa], seq_a[pb], qual_a[pb],
                                     PB=PB, LP2=LP2, max_shift=max_shift)
        qual_a = jnp.take(jnp.concatenate([qual_a, na, nb], axis=0), final_src,
                          axis=0)
        tiles = pk._pileup_tiles(srtk, cntk, seq_a, qual_a, ntiles=ntiles, T=T,
                                 HALO_L=HALO_L, LP=LP, LP2=LP2, K=K, GMAX=GMAX,
                                 min_phred=min_phred)
        return chk(tiles)

    # tiles only (no arbitration chain): isolates the Pallas pileup
    @functools.partial(jax.jit, static_argnames=tuple(statics))
    def stage_t(seq, qual, pos_rel, parity, srtk, cntk, *, LP2, PB, max_shift,
                ntiles, T, HALO_L, LP, K, GMAX, min_phred, W):
        seq_a, qual_a = dev._phase_align_device(seq, qual, pos_rel, parity, LP2=LP2)
        tiles = pk._pileup_tiles(srtk, cntk, seq_a, qual_a, ntiles=ntiles, T=T,
                                 HALO_L=HALO_L, LP=LP, LP2=LP2, K=K, GMAX=GMAX,
                                 min_phred=min_phred)
        return chk(tiles)

    args_np = (seq_p, qual_p, pos_p, parity_p, pa_p, pb_p, code_p, final_src,
               srtk, cntk, ref_p)

    def upload():
        d = [jnp.asarray(a) for a in args_np]
        return d

    def sync(x):
        return np.asarray(jax.device_get(x))

    def timeit(label, fn):
        t0 = time.perf_counter()
        sync(fn())  # compile + first exec
        t_cold = time.perf_counter() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        print(f"{label}: cold {t_cold:.2f}s  median {np.median(ts)*1e3:.1f} ms"
              f"  min {min(ts)*1e3:.1f} ms", flush=True)

    print(f"# n={n} Nb={Nb} L={L} LP2={LP2} GMAX={GMAX} ntiles={ntiles} "
          f"P_pad={P_pad} nc={nc}", flush=True)

    @jax.jit
    def sum_all(*xs):
        return sum(chk(x) for x in xs)

    t0 = time.perf_counter()
    d = upload()
    sync(sum_all(*d))
    print(f"A upload+chk(cold): {time.perf_counter()-t0:.3f}s "
          f"({sum(a.nbytes for a in args_np)/1e6:.1f} MB)", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        d = upload()
        sync(sum_all(*d))
        ts.append(time.perf_counter() - t0)
    print(f"A upload+chk(cached): median {np.median(ts)*1e3:.1f} ms", flush=True)
    # fresh content each iteration = true transfer cost
    ts = []
    for i in range(iters):
        fresh_seq = seq_p.copy(); fresh_seq[0, 0] = i + 1
        fresh_qual = qual_p.copy(); fresh_qual[0, 0] = i + 1
        t0 = time.perf_counter()
        dd = [jnp.asarray(a) for a in (fresh_seq, fresh_qual)]
        sync(sum_all(*dd))
        ts.append(time.perf_counter() - t0)
    print(f"A2 fresh seq+qual upload+chk: median {np.median(ts)*1e3:.1f} ms "
          f"({(seq_p.nbytes + qual_p.nbytes)/1e6:.1f} MB)", flush=True)

    (dseq, dqual, dpos, dpar, dpa, dpb, dcode, dsrc, dsrtk, dcntk, dref) = d
    dsrc_d = jnp.asarray(final_src)
    timeit("B align", lambda: stage_b(dseq, dqual, dpos, dpar, LP2=LP2))
    timeit("C align+arb", lambda: stage_c(dseq, dqual, dpos, dpar, dpa, dpb,
                                          dcode, LP2=LP2, PB=PB, max_shift=2))
    timeit("D align+arb+take", lambda: stage_d(dseq, dqual, dpos, dpar, dpa,
                                               dpb, dcode, dsrc_d, LP2=LP2,
                                               PB=PB, max_shift=2))
    timeit("T align+tiles", lambda: stage_t(dseq, dqual, dpos, dpar, dsrtk,
                                            dcntk, **statics))
    timeit("E align+arb+take+tiles", lambda: stage_e(dseq, dqual, dpos, dpar,
                                                     dpa, dpb, dcode, dsrc_d,
                                                     dsrtk, dcntk, **statics))

    full_statics = dict(L=L, OVW=dev._round_up(2 * L, 128), HAS_HARD=False,
                        NCH=2, **statics)
    hseq = jnp.zeros((1, L), jnp.uint8)
    hqual = jnp.zeros((1, L), jnp.uint8)
    hrefpos = jnp.full((1, L), -2, jnp.int32)
    hstrand = jnp.ones(1, jnp.int32)
    hkeep = jnp.zeros(1, bool)
    hpa = jnp.zeros(1, jnp.int32)
    hpb = jnp.zeros(1, jnp.int32)
    hpv = jnp.zeros(1, bool)
    dcand = jnp.asarray(cand_p)

    def full():
        sel, ovf = dev._fused_window_packed(
            dseq, dqual, dpos, dpar, dpa, dpb, dcode, dsrc_d,
            dsrtk, dcntk, dref, jnp.int32(woff_rel), hseq, hqual, hrefpos,
            hstrand, hkeep, hpa, hpb, hpv, dcand, **full_statics)
        return sel

    t0 = time.perf_counter()
    sel = full()
    out = sync(sel)
    print(f"F full+sel readback (cold-ish): {time.perf_counter()-t0:.2f}s "
          f"({out.nbytes/1e6:.1f} MB)", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = sync(full())
        ts.append(time.perf_counter() - t0)
    print(f"F full+sel readback: median {np.median(ts)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
