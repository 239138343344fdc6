"""Reference-scale mappability path (VERDICT r1 #5): a 100-contig / 100 Mb
synthetic bigWig track must load in seconds via the R-tree range query +
vectorized interval fill, and the vectorized prefix-sum check_mappability
must equal the per-read slice-sum oracle exactly."""
import time

import numpy as np
import pytest

from util_bigwig import write_bigwig_multi


def _runs_track(rng, n, p_flip=0.001):
    """Bismap-like piecewise-constant 0/1 float track."""
    flips = rng.random(n) < p_flip
    state = np.cumsum(flips) & 1
    return state.astype(np.float32)


def test_bigwig_scale_load(tmp_path):
    rng = np.random.default_rng(0)
    n_contig, clen = 100, 1_000_000
    chroms = [(f"chr{i}", _runs_track(rng, clen)) for i in range(n_contig)]
    path = tmp_path / "big.bw"
    write_bigwig_multi(str(path), chroms)

    from methyldackel_tpu.io.bigwig import BigWigFile

    t0 = time.perf_counter()
    bw = BigWigFile(str(path))
    assert bw.names == [f"chr{i}" for i in range(n_contig)]
    total = 0
    for name, vals in chroms[:: 10]:  # sample every 10th contig fully
        got = bw.values(name)
        assert got.shape == (clen,)
        assert np.array_equal(got, vals), name
        total += clen
    dt = time.perf_counter() - t0
    # open + 10 full-contig reads; the criterion is "seconds", not minutes
    assert dt < 30, f"bigWig scale load too slow: {dt:.1f}s"


def test_check_mappability_vectorized_oracle():
    from methyldackel_tpu.ops import semantics as sem
    from methyldackel_tpu.config import Config

    rng = np.random.default_rng(1)

    class B:
        pass

    n = 2000
    b = B()
    b.n = n
    b.tid = rng.integers(0, 3, n).astype(np.int32)
    b.pos = rng.integers(-2, 5000, n).astype(np.int64)
    b.mpos = rng.integers(-2, 5000, n).astype(np.int64)
    b.l_qseq = rng.integers(0, 150, n).astype(np.int32)
    b.flag = rng.integers(0, 1 << 12, n).astype(np.uint16)
    mapp = {0: rng.random(4000) < 0.5, 1: None, 2: rng.random(6000) < 0.9}

    for min_bases in (0, 1, 15, 100):
        cfg = Config()
        cfg.minMappableBases = min_bases
        got = sem.check_mappability(cfg, b, mapp)
        # oracle: literal per-read slice sums (the r1 implementation)
        exp = np.zeros(n, bool)
        for i in range(n):
            bits = mapp.get(int(b.tid[i]))
            lq = int(b.l_qseq[i])
            ok = 0
            for s in (int(b.pos[i]), int(b.mpos[i])):
                if bits is None or s < 0:
                    cnt = 0
                else:
                    s0, e0 = max(s, 0), min(s + lq, len(bits))
                    cnt = int(bits[s0:e0].sum()) if e0 > s0 else 0
                if cnt >= min_bases:
                    ok += 1
            exp[i] = ok > 0
        assert np.array_equal(got, exp), min_bases


def test_check_mappability_speed():
    from methyldackel_tpu.ops import semantics as sem
    from methyldackel_tpu.config import Config

    rng = np.random.default_rng(2)

    class B:
        pass

    n = 500_000
    b = B()
    b.n = n
    b.tid = np.zeros(n, np.int32)
    b.pos = rng.integers(0, 99_000_000, n).astype(np.int64)
    b.mpos = rng.integers(0, 99_000_000, n).astype(np.int64)
    b.l_qseq = np.full(n, 150, np.int32)
    b.flag = np.full(n, 0x63, np.uint16)
    mapp = {0: rng.random(100_000_000) < 0.8}
    cfg = Config()
    cfg.minMappableBases = 15
    t0 = time.perf_counter()
    got = sem.check_mappability(cfg, b, mapp)
    dt = time.perf_counter() - t0
    assert got.mean() > 0.9
    assert dt < 10, f"500k reads vs 100Mb track took {dt:.1f}s"
