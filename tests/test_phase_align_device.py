"""The device barrel-shift phase alignment (parallel.device
_phase_align_device — 7 conditional static shifts instead of a TPU-hostile
per-row minor-axis gather) must equal pileup_pallas.prealign_reads
byte-for-byte, including the parity bit on in-window padding bytes."""
import numpy as np


def test_phase_align_barrel_matches_prealign_oracle():
    from methyldackel_tpu.ops import pileup_pallas as pk
    from methyldackel_tpu.parallel.device import _phase_align_device

    rng = np.random.default_rng(0)
    for trial in range(8):
        N, L = 64, int(rng.integers(5, 151))
        LP2 = pk._round_up(L + 127, 128)
        seq = rng.choice([1, 2, 4, 8, 15], size=(N, L)).astype(np.uint8)
        lq = rng.integers(1, L + 1, N)
        col = np.arange(L)[None, :]
        seq[col >= lq[:, None]] = 0
        qual = rng.integers(0, 42, (N, L)).astype(np.uint8)
        qual[col >= lq[:, None]] = 0
        pos = rng.integers(0, 100000, N)
        strand = rng.integers(1, 5, N)
        sa, qa, _aligned, parity = pk.prealign_reads(seq, qual, pos, strand)
        da, dq = _phase_align_device(seq, qual, pos.astype(np.int32), parity,
                                     LP2=LP2)
        assert np.array_equal(np.asarray(da), sa), trial
        assert np.array_equal(np.asarray(dq), qa), trial
