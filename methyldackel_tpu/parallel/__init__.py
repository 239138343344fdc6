"""Device execution backends.

select_backend() chooses the per-window compute implementation:
- None → exact host (numpy) semantics (methyldackel_tpu.ops.semantics)
- JAX/Pallas pipeline (methyldackel_tpu.parallel.device) when a TPU (or
  forced JAX backend) is available; it computes the same uint32 counters and
  is tested bit-equal against the host path.
"""
from __future__ import annotations

import os


def enable_persistent_cache():
    """Persistent XLA compilation cache. TPU compiles here go through a
    remote-compile tunnel with highly variable latency (20-220 s per
    program); caching the serialized executables on disk makes every
    process after the first skip the tunnel entirely. Opt out with
    MDTPU_JAX_CACHE_DIR=0."""
    d = os.environ.get("MDTPU_JAX_CACHE_DIR",
                       os.path.expanduser("~/.cache/methyldackel_tpu/jax"))
    if not d or d == "0":
        return
    try:
        import jax

        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    _strip_mosaic_locations()


def _strip_mosaic_locations():
    """Make Pallas programs' cache keys stable across source edits.

    Mosaic serializes the kernel module WITH debug locations — including
    the full Python call stack — into the stablehlo custom_call's
    backend_config, where XLA's strip-debuginfo cache-key pass cannot
    reach it. Any line shift anywhere on the dispatch path then mints a
    new persistent-cache key, and each "new" program costs a full remote
    compile through the tunnel (~30-200 s) in the first process that runs
    it (measured: identical kernels lowered from two call sites produce
    different backend_config bytes). This wraps the Mosaic ASM lowering
    to round-trip the module through location-free ASM first. Opt out
    with MDTPU_STRIP_MOSAIC_LOCS=0."""
    if os.environ.get("MDTPU_STRIP_MOSAIC_LOCS", "1") == "0":
        return
    try:
        import jax._src.tpu_custom_call as tcc

        if getattr(tcc, "_mdtpu_locstrip", False):
            return
        orig = tcc._lower_mosaic_module_to_asm
        ir = tcc.ir

        def stripped(module, **kw):
            try:
                with module.context:
                    asm = module.operation.get_asm(enable_debug_info=False)
                    module = ir.Module.parse(asm)
            except Exception:
                pass  # fall back to the located module
            return orig(module, **kw)

        tcc._lower_mosaic_module_to_asm = stripped
        tcc._mdtpu_locstrip = True
    except Exception:
        pass


def _force_platform():
    """MDTPU_FORCE_PLATFORM=cpu|tpu pins the JAX platform through the config
    API (the axon plugin ignores the JAX_PLATFORMS env var, so subprocess
    tests need this to run device engines on the virtual CPU mesh)."""
    plat = os.environ.get("MDTPU_FORCE_PLATFORM")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def _apply_device_chunk(cfg):
    """MDTPU_DEVICE_CHUNK: device-engine window size override (bytes of
    genome per window). Bigger windows amortize per-window RPC latency,
    readback round trips and finalize overheads over the tunnel; output is
    chunk-size invariant (adjustBounds; tests). Only applied when the user
    left --chunkSize at its default."""
    ov = os.environ.get("MDTPU_DEVICE_CHUNK")
    if ov and int(getattr(cfg, "chunkSize", 0)) == 1_000_000:
        cfg.chunkSize = max(1, int(ov))


def select_backend(cfg):
    mode = os.environ.get("MDTPU_ENGINE", "auto")
    if mode == "host":
        return None
    _force_platform()  # before any jax-importing module loads
    if mode == "mesh":
        # Multi-chip (dp, sp) shard_map engine: reads sharded over dp with
        # psum-merged counters, window coordinates sharded over sp.
        from .mesh import make_mesh_backend

        enable_persistent_cache()
        return make_mesh_backend(cfg)
    try:
        from .device import make_device_backend
    except Exception:
        if mode == "jax":
            raise
        return None
    if mode == "jax":
        enable_persistent_cache()
        _apply_device_chunk(cfg)
        return make_device_backend(cfg)
    # auto: only use the device path when an accelerator is present
    try:
        import jax

        platform = jax.devices()[0].platform
    except Exception:
        return None
    if platform in ("tpu", "axon"):
        enable_persistent_cache()
        _apply_device_chunk(cfg)
        return make_device_backend(cfg)
    return None


def _select_device_fn(cfg, make_fn_name):
    """Shared engine-selection policy for the per-subcommand device
    backends: MDTPU_ENGINE=jax|mesh force the device path; host forces the
    exact host engine; auto picks the device path iff an accelerator is
    attached — since the v3 redesign (host 2-bit pack + tiny device
    reduction, VERDICT r3 #3) the device backends beat the host kernels on
    this box (BENCH_r04: mbias 248k vs 179k, perRead 123k vs 73k reads/s,
    interleaved medians), reversing the r3 policy
    (artifacts/perf_breakdown_r03.md)."""
    mode = os.environ.get("MDTPU_ENGINE", "auto")
    if mode == "host":
        return None
    if mode not in ("jax", "mesh", "auto"):
        return None
    _force_platform()  # before any jax-importing module loads
    if mode == "auto":
        try:
            import jax

            platform = jax.devices()[0].platform
        except Exception:
            return None
        if platform not in ("tpu", "axon"):
            return None
    from . import device as _dev

    make_fn = getattr(_dev, make_fn_name)
    enable_persistent_cache()
    return make_fn(cfg)


def select_mbias_backend(cfg):
    """Device compute for the mbias counter tensor (None → host numpy).
    mesh uses the same per-window kernel; the counter merge is already an
    associative add across windows/hosts."""
    return _select_device_fn(cfg, "make_mbias_backend")


def select_perread_backend(cfg):
    """Device chain walker for perRead's gapless rows (None → host numpy)."""
    return _select_device_fn(cfg, "make_perread_backend")
