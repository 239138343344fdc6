"""Device execution backends.

select_backend() chooses the per-window compute implementation:
- None → exact host (numpy) semantics (methyldackel_tpu.ops.semantics)
- JAX/Pallas pipeline (methyldackel_tpu.parallel.device) when a TPU (or
  forced JAX backend) is available; it computes the same uint32 counters and
  is tested bit-equal against the host path.
"""
from __future__ import annotations

import os


def select_backend(cfg):
    mode = os.environ.get("MDTPU_ENGINE", "auto")
    if mode == "host":
        return None
    try:
        from .device import make_device_backend
    except Exception:
        if mode == "jax":
            raise
        return None
    if mode == "jax":
        return make_device_backend(cfg)
    # auto: only use the device path when an accelerator is present
    try:
        import jax

        platform = jax.devices()[0].platform
    except Exception:
        return None
    if platform in ("tpu", "axon"):
        return make_device_backend(cfg)
    return None
