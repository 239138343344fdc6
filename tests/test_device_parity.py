"""Device (JAX) pipeline vs exact host (numpy) semantics: bit-equality on
randomized synthetic WGBS batches, run on the CPU backend."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from methyldackel_tpu.config import Config
from methyldackel_tpu.ops import semantics as sem
from methyldackel_tpu.parallel import device as dev
from methyldackel_tpu.utils.simulate import random_reference, simulate_batch


@pytest.fixture(scope="module")
def sim():
    rng = np.random.default_rng(42)
    ref_ascii, ref_codes = random_reference(rng, 5000)
    batch = simulate_batch(rng, ref_codes, n_pairs=60, read_len=100)
    return rng, ref_ascii, batch


def test_strand_parity(sim):
    rng, _, batch = sim
    flags = rng.integers(0, 1 << 12, size=512).astype(np.uint16)
    flags |= 0x1  # paired bit on half, also test unpaired
    flags[::2] &= ~np.uint16(0x1)
    xg = rng.integers(0, 3, size=512).astype(np.int8)
    host = sem.strand(flags, xg)
    devv = np.asarray(dev.strand_device(jnp.asarray(flags), jnp.asarray(xg)))
    np.testing.assert_array_equal(host.astype(np.int32), devv)


def test_context_parity(sim):
    _, ref_ascii, _ = sim
    host_t, _ = sem.classify_context(ref_ascii)
    devv = np.asarray(dev.classify_context_device(jnp.asarray(ref_ascii)))
    np.testing.assert_array_equal(host_t, devv)


def test_trim_parity(sim):
    rng, _, batch = sim
    st = sem.strand(batch.flag, batch.xg)
    bounds = [3, 80, 5, 90] + [0] * 12
    abounds = [0] * 4 + [7, 6, 2, 9] + [0] * 8
    hseq, hqual = batch.seq.copy(), batch.qual.copy()
    sem.trim_alignment(hseq, hqual, batch.l_qseq, st, batch.flag, bounds)
    sem.trim_absolute(hseq, hqual, batch.l_qseq, st, batch.flag, abounds)
    dseq, dqual = dev.trim_device(
        jnp.asarray(batch.seq), jnp.asarray(batch.qual),
        jnp.asarray(batch.l_qseq), jnp.asarray(st.astype(np.int32)),
        jnp.asarray(batch.flag.astype(np.uint16)),
        jnp.asarray(np.array(bounds, np.int32)),
        jnp.asarray(np.array(abounds, np.int32)),
    )
    np.testing.assert_array_equal(hseq, np.asarray(dseq))
    np.testing.assert_array_equal(hqual, np.asarray(dqual))


def test_conv_eff_parity(sim):
    _, ref_ascii, batch = sim
    st = sem.strand(batch.flag, batch.xg)
    host = sem.conversion_efficiency(batch.seq, batch.qual, batch.refpos, st,
                                     ref_ascii, 0, 5)
    ctype = dev.classify_context_device(jnp.asarray(ref_ascii))
    devv = np.asarray(dev.conv_eff_device(
        jnp.asarray(batch.seq), jnp.asarray(batch.qual),
        jnp.asarray(batch.refpos.astype(np.int32)),
        jnp.asarray(st.astype(np.int32)), ctype, 0, len(ref_ascii), 5,
    ))
    # XLA may lower f32 division to reciprocal+multiply (1 ulp); the CLI
    # engine therefore keeps the conversion-efficiency *gate* on the host
    # (engine.extract.prepare_window_reads) for bit-exactness.
    np.testing.assert_allclose(host, devv, rtol=2e-7, atol=0)


def test_arbitrate_parity(sim):
    rng, _, batch = sim
    st = sem.strand(batch.flag, batch.xg)
    a, b = sem.pair_mates(batch.qname, batch.flag)
    hqual = batch.qual.copy()
    sem.arbitrate_overlaps(batch.seq, hqual, batch.refpos, st, a, b)
    ovw = ((2 * batch.seq.shape[1] + 127) // 128) * 128
    dqual = np.asarray(dev.arbitrate_device(
        jnp.asarray(batch.seq), jnp.asarray(batch.qual),
        jnp.asarray(batch.refpos.astype(np.int32)),
        jnp.asarray(st.astype(np.int32)),
        jnp.asarray(a.astype(np.int32)), jnp.asarray(b.astype(np.int32)),
        jnp.asarray(np.ones(len(a), bool)), ovw,
    ))
    np.testing.assert_array_equal(hqual, dqual)


def test_pileup_parity(sim):
    rng, ref_ascii, batch = sim
    st = sem.strand(batch.flag, batch.xg)
    a, b = sem.pair_mates(batch.qname, batch.flag)
    sem.arbitrate_overlaps(batch.seq, batch.qual, batch.refpos, st, a, b)
    W = 4096
    keep_base = np.ones(batch.seq.shape, dtype=bool)
    host = sem.pileup_channels(batch.seq, batch.qual, batch.refpos, st,
                               keep_base, ref_ascii, 0, 0, W, 5)
    devv = np.asarray(dev.pileup_device(
        jnp.asarray(batch.seq), jnp.asarray(batch.qual),
        jnp.asarray(batch.refpos.astype(np.int32)),
        jnp.asarray(st.astype(np.int32)),
        jnp.ones(batch.n, bool), jnp.asarray(keep_base),
        jnp.asarray(ref_ascii), 0, 0, W, 5,
    ))
    np.testing.assert_array_equal(host, devv)


def test_full_window_pipeline_matches_host_backend(sim):
    """End-to-end: engine host backend vs parallel.device backend."""
    rng = np.random.default_rng(7)
    ref_ascii, ref_codes = random_reference(rng, 3000)
    batch = simulate_batch(rng, ref_codes, n_pairs=40, read_len=80)
    cfg = Config()
    st = sem.strand(batch.flag, batch.xg)
    from methyldackel_tpu.engine.extract import compute_window_counters_host
    import copy

    keep = np.ones(batch.n, dtype=bool)
    b1 = copy.deepcopy(batch)
    host = compute_window_counters_host(cfg, b1, st, keep, ref_ascii, 0, 0, 2800)
    from methyldackel_tpu.parallel.device import make_device_backend

    b2 = copy.deepcopy(batch)
    # device backend expects pre-trimmed input (host prepare step): no
    # bounds configured here, so raw input is fine
    devb = make_device_backend(cfg)
    devc = devb(cfg, b2, st, keep, ref_ascii, 0, 0, 2800)
    np.testing.assert_array_equal(host, devc)


def test_arbitrate_prealigned_matches_host():
    """The static-shift arbitration on phase-aligned rows equals the exact
    host arbitration for gapless adjacent-mate batches."""
    from methyldackel_tpu.ops.pileup_pallas import prealign_reads
    from methyldackel_tpu.utils.simulate import simulate_batch_fast

    rng = np.random.default_rng(11)
    from methyldackel_tpu.utils.simulate import random_reference
    ref_ascii, ref_codes = random_reference(rng, 4000)
    batch = simulate_batch_fast(rng, ref_codes, 200, 150)
    st = sem.strand(batch.flag, batch.xg)

    # host truth
    hq = batch.qual.copy()
    a, b = sem.pair_mates(batch.qname, batch.flag)
    sem.arbitrate_overlaps(batch.seq, hq, batch.refpos, st, a, b)

    seq_a, qual_a, aligned, parity = prealign_reads(
        batch.seq, batch.qual, batch.pos, st
    )
    L = batch.seq.shape[1]
    max_shift = (L + 127) // 128
    out = np.asarray(dev.arbitrate_prealigned(
        jnp.asarray(seq_a), jnp.asarray(qual_a), jnp.asarray(aligned),
        jnp.asarray(st.astype(np.int32)), jnp.asarray(batch.flag.astype(np.uint16)),
        max_shift,
    ))
    # compare at read-base columns (un-shift)
    pad = (batch.pos % 128).astype(np.int64)
    rows = np.arange(batch.n)[:, None]
    cols = pad[:, None] + np.arange(L)[None, :]
    got = out[rows, cols]
    np.testing.assert_array_equal(got, hq)


def test_hybrid_fast_backend_matches_host(monkeypatch):
    """The hybrid Pallas/XLA CLI backend (gapless pairs via Pallas kernels,
    indel pairs via the XLA path) equals the exact host computation."""
    monkeypatch.setenv("MDTPU_PALLAS_INTERPRET", "1")
    from methyldackel_tpu.engine.extract import compute_window_counters_host
    from methyldackel_tpu.parallel.device import make_device_backend
    from methyldackel_tpu.utils.simulate import simulate_batch_fast
    import copy

    cfg = Config()
    rng = np.random.default_rng(17)
    ref_ascii, ref_codes = random_reference(rng, 6000)
    # mix: fast gapless pairs + slow indel pairs (simulate_batch w/ indels)
    fast_b = simulate_batch_fast(rng, ref_codes, 80, 100)
    slow_b = simulate_batch(rng, ref_codes, 20, 90)
    # introduce indels into slow_b by shifting refpos mid-read
    for i in range(0, slow_b.n, 3):
        slow_b.refpos[i, 50:] += 2  # 2bp deletion mid-read

    from methyldackel_tpu.io.bam import ReadBatch

    def cat(f):
        a, b = getattr(fast_b, f), getattr(slow_b, f)
        if f == "qname":
            return list(a) + [q + "_s" for q in b]
        L = max(a.shape[1], b.shape[1]) if a.ndim == 2 else None
        if L is not None:
            def pad(x):
                fill = -2 if f == "refpos" else 0
                out = np.full((x.shape[0], L), fill, x.dtype)
                out[:, : x.shape[1]] = x
                return out
            return np.concatenate([pad(a), pad(b)])
        return np.concatenate([a, b])

    batch = ReadBatch(**{f: cat(f) for f in (
        "qname", "flag", "tid", "pos", "mapq", "l_qseq", "endpos", "mtid",
        "mpos", "xg", "nh", "seq", "qual", "refpos")})
    st = sem.strand(batch.flag, batch.xg)
    keep = np.ones(batch.n, bool)
    W = 5632

    host = compute_window_counters_host(cfg, copy.deepcopy(batch), st, keep,
                                        ref_ascii, 0, 0, W)
    backend = make_device_backend(cfg)
    got = backend(cfg, copy.deepcopy(batch), st, keep, ref_ascii, 0, 0, W)
    np.testing.assert_array_equal(host, got)


def test_eq_base_code_routes_exact(monkeypatch):
    """Base code 0 ('=': match-to-reference, legal BAM) is the padding
    sentinel of the prealigned Pallas layout; rows containing it must route
    through the exact XLA dense subpath and still match the host engine."""
    monkeypatch.setenv("MDTPU_PALLAS_INTERPRET", "1")
    from methyldackel_tpu.engine.extract import compute_window_counters_host
    from methyldackel_tpu.parallel.device import make_device_backend, _rows_no_eq_base
    from methyldackel_tpu.utils.simulate import simulate_batch_fast
    import copy

    cfg = Config()
    rng = np.random.default_rng(23)
    ref_ascii, ref_codes = random_reference(rng, 6000)
    batch = simulate_batch_fast(rng, ref_codes, 60, 100)
    # inject '=' into a few gapless reads (both overlap and pileup columns)
    batch.seq[4, 10:20] = 0
    batch.seq[5, 0:5] = 0
    batch.seq[20, 50] = 0
    assert not _rows_no_eq_base(batch.seq, batch.l_qseq)[[4, 5, 20]].any()
    st = sem.strand(batch.flag, batch.xg)
    keep = np.ones(batch.n, bool)
    W = 5632

    host = compute_window_counters_host(cfg, copy.deepcopy(batch), st, keep,
                                        ref_ascii, 0, 0, W)
    backend = make_device_backend(cfg)
    got = backend(cfg, copy.deepcopy(batch), st, keep, ref_ascii, 0, 0, W)
    np.testing.assert_array_equal(host, got)


def test_arbitrate_device_pad_pairs_alias_row():
    """Pad pairs (pair_valid=False) may point both mates at the same row
    (the fused path's NH-1 convention); the gather-based row routing must
    leave that row's quals untouched and still rewrite real pairs."""
    import numpy as np
    import jax.numpy as jnp
    from methyldackel_tpu.ops import semantics as sem
    from methyldackel_tpu.parallel import device as dev

    rng = np.random.default_rng(5)
    n, L = 8, 32
    seq = rng.integers(0, 16, (n, L)).astype(np.uint8)
    qual = rng.integers(0, 42, (n, L)).astype(np.uint8)
    start = rng.integers(0, 10, n).astype(np.int32)
    refpos = start[:, None] + np.arange(L, dtype=np.int32)[None, :]
    strand = np.ones(n, np.int32)
    # one real pair (0, 1) + two pad pairs aliasing row n-1
    pair_a = np.array([0, n - 1, n - 1], np.int32)
    pair_b = np.array([1, n - 1, n - 1], np.int32)
    pv = np.array([True, False, False])
    want = qual.copy()
    sem.arbitrate_overlaps(seq, want, refpos, strand,
                           pair_a[:1].astype(np.int64),
                           pair_b[:1].astype(np.int64))
    got = np.asarray(dev.arbitrate_device(
        jnp.asarray(seq), jnp.asarray(qual),
        jnp.asarray(refpos), jnp.asarray(strand),
        jnp.asarray(pair_a), jnp.asarray(pair_b), jnp.asarray(pv), 128))
    assert np.array_equal(got, want)
