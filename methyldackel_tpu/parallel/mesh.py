"""Multi-chip execution: jax.sharding Mesh over (dp, sp).

The reference's only parallelism is pthreads over a mutex-guarded genome
cursor with ticket-ordered output (main.c:7-15, extract.c:326-350,
:514-535). The TPU-native replacement is a 2-D mesh:

- dp ("data parallel"): read batches are sharded across devices; each
  device scatter-adds its shard's contributions and the partial counters
  are merged with a psum over ICI — the psum IS the communication backend,
  replacing the ordered-output mutex. Mate pairs are co-sharded via the
  adjacent-mate layout (mates occupy rows 2i and 2i+1), the analogue of
  the chunk-local overlap hash (overlaps.c:12-14).
- sp ("sequence/position parallel"): the genome-coordinate axis of the
  counter tensor is sharded, so each device owns a position slice and only
  its slice's counters are materialized — the analogue of the reference's
  1 Mb genome chunks, but across chips instead of threads.

Determinism comes from the fixed reduction structure of the sharded
program, not from output tickets: integer counters make every schedule
bit-identical.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from . import device as dev


def make_mesh(n_devices: int | None = None):
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    devices = devices[:n]
    # Prefer a 2-D (dp, sp) layout when the device count allows it, so both
    # parallel axes are exercised; fall back to pure data parallelism.
    sp = 1
    for cand in (4, 2):
        if n % cand == 0 and n // cand >= 2:
            sp = cand
            break
    dp = n // sp
    return Mesh(np.array(devices).reshape(dp, sp), ("dp", "sp"))


def sharded_window_pipeline(mesh: Mesh, *, wpad: int, ovw: int, min_phred: int,
                            min_conv_eff: float, use_overlaps: bool):
    """Build the jitted multi-chip window step.

    Read tensors are sharded over dp with the adjacent-mate layout (mates at
    rows 2i/2i+1, so every pair is shard-local); the reference window is
    replicated; output counters are sharded over sp. Requires
    N % (2*dp) == 0 and wpad % sp == 0.
    """
    sp_size = mesh.shape["sp"]
    wshard = wpad // sp_size

    def local_step(seq, qual, refpos, flag, xg, l_qseq, keep_read, ref,
                   bounds, absolute_bounds, win_offset, win_start):
        strand = dev.strand_device(flag, xg)
        if min_conv_eff > 0.0:
            ctype = dev.classify_context_device(ref)
            eff = dev.conv_eff_device(seq, qual, refpos, strand, ctype,
                                      win_offset, ref.shape[0], min_phred)
            keep_read = keep_read & (eff >= jnp.float32(min_conv_eff))
        seq, qual = dev.trim_device(seq, qual, l_qseq, strand, flag, bounds,
                                    absolute_bounds)
        if use_overlaps:
            rows = seq.shape[0]
            pair_a = jnp.arange(0, rows, 2, dtype=jnp.int32)
            pair_b = pair_a + 1
            pair_valid = (
                ((flag[pair_a] & 0x1) != 0) & ((flag[pair_a] & 12) == 0)
                & ((flag[pair_b] & 0x1) != 0) & ((flag[pair_b] & 12) == 0)
            )
            qual = dev.arbitrate_device(seq, qual, refpos, strand, pair_a,
                                        pair_b, pair_valid, ovw)
        # Each device owns one sp slice of the window; contributions outside
        # the slice are masked by the pileup's window bounds.
        sp_idx = jax.lax.axis_index("sp")
        slice_start = win_start + sp_idx * wshard
        keep_base = jnp.ones(seq.shape, dtype=bool)
        local = dev.pileup_device(seq, qual, refpos, strand, keep_read,
                                  keep_base, ref, win_offset, slice_start,
                                  wshard, min_phred)
        # Merge the read shards' partial counters over ICI.
        return jax.lax.psum(local, "dp")

    spec_reads = P("dp", None)
    spec_read1 = P("dp")
    spec_rep = P()
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec_reads, spec_reads, spec_reads, spec_read1, spec_read1,
                  spec_read1, spec_read1, spec_rep, spec_rep, spec_rep,
                  spec_rep, spec_rep),
        out_specs=P("sp", None),
        check_rep=False,
    )
    return jax.jit(fn)


def run_sharded_window(mesh, batch, ref, win_offset, win_start, wpad,
                       min_phred=5, min_conv_eff=0.0, use_overlaps=True,
                       bounds=None, absolute_bounds=None):
    """Pad/shard a ReadBatch-style struct (adjacent-mate layout) and execute
    one multi-chip window step. Returns uint32 [wpad, 4]."""
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    assert wpad % sp == 0, "window must divide over the sp axis"
    n = batch.seq.shape[0]
    L = batch.seq.shape[1]
    unit = 2 * dp
    n_pad = ((n + unit - 1) // unit) * unit

    def pad(x, fill=0):
        out = np.full((n_pad,) + x.shape[1:], fill, dtype=x.dtype)
        out[:n] = x
        return out

    ovw = ((2 * L + 127) // 128) * 128
    fn = sharded_window_pipeline(mesh, wpad=wpad, ovw=ovw, min_phred=min_phred,
                                 min_conv_eff=min_conv_eff,
                                 use_overlaps=use_overlaps)
    keep = np.ones(n, dtype=bool)
    out = fn(
        pad(batch.seq), pad(batch.qual),
        pad(batch.refpos.astype(np.int32), -2),
        pad(batch.flag.astype(np.uint16)), pad(batch.xg),
        pad(batch.l_qseq), pad(keep),
        jnp.asarray(ref),
        jnp.asarray(np.zeros(16, np.int32) if bounds is None else np.asarray(bounds, np.int32)),
        jnp.asarray(np.zeros(16, np.int32) if absolute_bounds is None
                    else np.asarray(absolute_bounds, np.int32)),
        jnp.int32(win_offset), jnp.int32(win_start),
    )
    return np.asarray(jax.device_get(out))
