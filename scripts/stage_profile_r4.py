#!/usr/bin/env python
"""Round-4 uncontended per-stage CPU profile of the extract hot path.

Times every host-CPU stage the jax engine pays per window against the
stages the host engine pays, on the same synthetic window, single
threaded, no TPU, no contention. Reports wall AND thread-CPU time.

Run: python scripts/stage_profile_r4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MDTPU_FORCE_PLATFORM", "cpu")

import numpy as np


def timeit(fn, reps=7):
    best_w = best_c = 1e9
    for _ in range(reps):
        w0 = time.perf_counter()
        c0 = time.thread_time()
        fn()
        w = time.perf_counter() - w0
        c = time.thread_time() - c0
        best_w = min(best_w, w)
        best_c = min(best_c, c)
    return best_w, best_c


def main():
    from methyldackel_tpu.utils.simulate import random_reference, simulate_batch_fast
    from methyldackel_tpu.ops import semantics as sem
    from methyldackel_tpu.io import native
    from methyldackel_tpu.config import Config

    rng = np.random.default_rng(0)
    W = 1 << 20
    n_pairs = 30_000  # ~60k reads = one CLI window at 18x coverage
    L = 150
    ref_ascii, ref_codes = random_reference(rng, W + 64)
    batch = simulate_batch_fast(rng, ref_codes, n_pairs, L)
    n = batch.n
    st = sem.strand(batch.flag, batch.xg)
    cfg = Config()
    cfg.chunkSize = W
    print(f"n={n} L={L} W={W} native={native.available()}")

    results = {}

    def rec(name, fn, reps=7):
        w, c = timeit(fn, reps)
        results[name] = (w, c)
        print(f"{name:32s} wall={w*1e3:8.2f} ms  cpu={c*1e3:8.2f} ms")

    # ---- shared stages ----
    kidx = np.arange(n)
    seq0, qual0 = batch.seq, batch.qual
    refpos, pos, lq = batch.refpos, batch.pos, batch.l_qseq
    a_np, b_np = sem.pair_mates_batch(batch, kidx)

    rec("filter_reads", lambda: sem.filter_reads(cfg, batch, st, None))
    rec("trim_alignment(zero-bounds)",
        lambda: sem.trim_alignment(seq0, qual0, lq, st, batch.flag, cfg.bounds))
    rec("pair_mates_batch", lambda: sem.pair_mates_batch(batch, kidx))

    # ---- host-engine-only: native arbitrate + pileup ----
    def host_compute():
        seq = seq0.copy()
        qual = qual0.copy()
        native.arbitrate(seq, qual, refpos, st, a_np, b_np)
        native.pileup_channels(seq, qual, refpos, st,
                               np.ones(seq.shape, bool), ref_ascii, 0, 0, W, 5)
    rec("HOST native arb+pileup", host_compute)

    qual_arb = qual0.copy()
    seq_arb = seq0.copy()
    native.arbitrate(seq_arb, qual_arb, refpos, st, a_np, b_np)
    rec("native arbitrate alone", lambda: (
        native.arbitrate(seq0.copy(), qual0.copy(), refpos, st, a_np, b_np)))
    rec("native pileup alone", lambda: native.pileup_channels(
        seq_arb, qual_arb, refpos, st, np.ones(seq_arb.shape, bool),
        ref_ascii, 0, 0, W, 5))
    rec("qual/seq copies alone", lambda: (seq0.copy(), qual0.copy()))

    # ---- jax-engine-only prep stages (v3 2-bit path) ----
    from methyldackel_tpu.parallel import device as dev

    rec("v3_flags", lambda: native.v3_flags(
        seq0, refpos if refpos.dtype == np.int32 else refpos.astype(np.int32),
        pos, lq))
    simple = native.v3_flags(seq0, refpos.astype(np.int32), pos, lq)
    if simple is None:
        simple = dev._rows_gapless(refpos, pos, lq) & dev._rows_no_eq_base(seq0, lq)
    xla_rows = ~simple
    fast_rows = np.nonzero(~xla_rows)[0]
    f_pos = pos[fast_rows]
    nf = len(fast_rows)
    print(f"  fast rows: {nf}/{n}")

    L4 = 4 * ((L + 3) // 4)
    Lq = (L + 3) // 4
    aligned = (f_pos) - (f_pos % 128)

    def sort_tables():
        order = np.argsort(aligned, kind="stable")
        al_s = aligned[order]
        ntiles = (W + 511) // 512
        K = (512 + 256) // 128
        bounds = (np.arange(ntiles)[:, None] * 512 - 256
                  + 128 * np.arange(K + 1)[None, :])
        flat = np.searchsorted(al_s, bounds.reshape(-1), side="left")
        return order, flat
    rec("argsort+searchsorted tables", sort_tables)
    order, _ = sort_tables()
    src = fast_rows[order]

    Nb = 256
    while Nb < nf + 64:
        Nb *= 2
    rec("native v3_pack2", lambda: native.v3_pack2(
        seq_arb, qual_arb, src, pos, st, Lq, Nb, 0, 5))

    packed = native.v3_pack2(seq_arb, qual_arb, src, pos, st, Lq, Nb, 0, 5)
    seqpack = packed[0]
    rec("blob concat", lambda: np.concatenate(
        [seqpack.reshape(-1), np.zeros(2 * (W // 8) + Nb + 1024, np.uint8)]))

    # ---- readback-side host cost (simulated: u8 [2, Wpad] -> cmaj) ----
    wpad = ((W + 511) // 512) * 512
    sel_h = np.random.default_rng(1).integers(0, 50, (2, wpad), dtype=np.uint8)

    def readback_host():
        cmaj = np.zeros((4, wpad), np.uint32)
        cmaj[:2] = sel_h
        return cmaj.T[:W]
    rec("readback widen+cmaj", readback_host)

    # ---- emit (shared) ----
    from methyldackel_tpu.engine import extract as ex
    counters = readback_host()
    rec("emit_window", lambda: ex.emit_window(
        cfg, "chr1", 0, 0, W, 0, ref_ascii, counters, None))

    # ---- decode stage: full synthetic BAM once ----
    import tempfile
    from methyldackel_tpu.utils.simulate import write_synthetic_input
    from methyldackel_tpu.io.bam import BamFile
    from methyldackel_tpu.io.bai import build_bai
    d = tempfile.mkdtemp(prefix="mdtpu_prof_")
    fa, bam_path = write_synthetic_input(d, n_pairs, L, W, seed=0)
    build_bai(BamFile(bam_path), bam_path + ".bai")

    def decode():
        bf = BamFile(bam_path)
        v = bf.window_soa(0, 0, W)
        idx = v.overlapping(0, 0, W)
        return v.batch(idx)
    rec("decode window_soa+batch", decode, reps=3)

    print("\nSummary (per 60k-read window, ms CPU):")
    jax_only = ["v3_flags", "argsort+searchsorted tables", "native v3_pack2",
                "blob concat", "readback widen+cmaj", "native arbitrate alone",
                "qual/seq copies alone"]
    host_only = ["HOST native arb+pileup"]
    jt = sum(results[k][1] for k in jax_only if k in results)
    ht = sum(results[k][1] for k in host_only)
    print(f"  jax-only extra: {jt*1e3:.1f} ms   host-only compute: {ht*1e3:.1f} ms")
    print(f"  -> jax wins the per-window CPU race by {ht/jt:.2f}x" if jt < ht
          else f"  -> HOST wins the per-window CPU race by {jt/ht:.2f}x")


if __name__ == "__main__":
    main()
