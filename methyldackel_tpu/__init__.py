"""methyldackel_tpu — a TPU-native bisulfite methylation-extraction framework.

A from-scratch re-design of the capabilities of MethylDackel
(/root/reference, C/htslib/pthreads) for JAX/XLA/Pallas on TPU:

- Host ingest (methyldackel_tpu.io): pure-Python + native-C++ readers for
  BGZF/BAM/BAI, faidx FASTA, BED, bigWig and the BBM mappability codec.
  Decoded alignments become fixed-width structure-of-arrays tensors.
- Compute core (methyldackel_tpu.ops): the per-read/per-base semantics of the
  reference (strand inference, context classification, methylation calling,
  filtering, trimming, mate-overlap arbitration, conversion efficiency) as
  branch-free vectorized JAX ops, and the pileup as a masked scatter-add over
  reference coordinates (XLA scatter + Pallas kernel).
- Engine (methyldackel_tpu.engine): genome-window scheduler, the four
  subcommands (extract / mbias / mergeContext / perRead), byte-compatible
  output formatting, SVG rendering.
- Parallel (methyldackel_tpu.parallel): jax.sharding Mesh data parallelism
  over reads with psum-merged position counters, replacing the reference's
  pthread mutex scheduler (main.c:7-15, extract.c:326-350).
"""

__version__ = "0.1.0"

# The reference version whose behavior this framework reproduces
# (/root/reference/Makefile:14).
REFERENCE_VERSION = "0.6.1"
