"""Multi-host execution scaffolding.

The reference's scale-out story ends at pthreads on one machine. The
TPU-native plan (SURVEY §2 / BASELINE north star) spans two networks:

- DCN (host level): genome windows are statically partitioned across hosts
  — host h owns every window w with w % n_hosts == h. Window outputs are
  written per-host and concatenated in window order afterwards (or streamed
  through host 0), so output bytes are identical to a single-host run for
  any host count: the multi-host analogue of the reference's ticket-ordered
  flush (extract.c:514-535).
- ICI (chip level): within a host, the (dp, sp) mesh of parallel.mesh
  shards read batches and window coordinates across the local chips with a
  psum merge.

Mate-pair locality holds by construction: a window's compute consumes every
read overlapping that window (both mates of an overlapping pair are fetched
by the same host), matching the reference's chunk-local overlap handling
(overlaps.c:12-14, common.c:441).

This module is exercised single-process in CI; jax.distributed
initialization requires a real multi-host slice.
"""
from __future__ import annotations

import os


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize jax.distributed from explicit args or the standard env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). Returns
    (process_id, num_processes); (0, 1) when not in a multi-host job."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return 0, 1
    # Pin the platform BEFORE the first jax backend initializes: with
    # MDTPU_ENGINE=host nothing else forces it, and on this machine the
    # axon plugin ignores JAX_PLATFORMS — an axon-backed multi-process job
    # here gave every process process_index()==0, making ALL hosts run the
    # host-0 shard merge concurrently (observed as vanishing-shard
    # FileNotFoundError races).
    from . import _force_platform

    _force_platform()
    num_processes = int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1))
    process_id = int(process_id if process_id is not None
                     else os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return process_id, num_processes


def owned_windows(windows_iter, process_id: int, num_processes: int):
    """Round-robin static window partition over hosts (DCN sharding of the
    genome cursor). Deterministic: no coordination needed beyond the static
    assignment; outputs reassemble in window order."""
    for i, w in enumerate(windows_iter):
        if i % num_processes == process_id:
            yield i, w


def merge_host_outputs(prefix: str, out_path: str, num_processes: int,
                       n_windows: int) -> None:
    """Concatenate per-host per-window shards (written as
    f"{prefix}.h{h}.w{i}") into one output in window order."""
    with open(out_path, "a") as out:
        for i in range(n_windows):
            shard = f"{prefix}.h{i % num_processes}.w{i}"
            if os.path.exists(shard):
                with open(shard) as fh:
                    out.write(fh.read())
                os.unlink(shard)


def host_role() -> tuple[int, int]:
    """(host_id, n_hosts) for this process. MDTPU_NUM_HOSTS/MDTPU_HOST_ID
    simulate a multi-host job from independent processes (each owning its
    window residue class); JAX_COORDINATOR_ADDRESS initializes a real
    jax.distributed job."""
    n = os.environ.get("MDTPU_NUM_HOSTS")
    if n:
        return int(os.environ.get("MDTPU_HOST_ID", "0")), int(n)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return init_distributed()
    return 0, 1


def merge_shards(out_path: str) -> int:
    """Append every `{out_path}.h{h}.w{i}` shard to out_path in window
    order (the multi-host analogue of the reference's ticket-ordered flush,
    extract.c:514-535) and remove the shards. Returns #shards merged.

    Window ownership is a static residue class per host, so shard names
    never collide and the merged bytes are identical to a single-host run
    for any host count."""
    import glob
    import re

    shards = []
    for p in glob.glob(glob.escape(out_path) + ".h*.w*"):
        m = re.search(r"\.h(\d+)\.w(\d+)$", p)
        if m:
            shards.append((int(m.group(2)), p))
    shards.sort()
    n = 0
    # Exclusive merger lock (flock, auto-released by the kernel if the
    # merger dies — an O_EXCL lockfile would wedge every future merge
    # after a crash): a second concurrent merger bails out instead of
    # interleaving appends into out_path. (The rename claim below only
    # guarantees each shard is consumed once; it cannot order two writers'
    # appends. In a correctly configured job only host 0 merges — the
    # _force_platform pin in init_distributed is what prevents the
    # double-merge — so this lock is a belt-and-braces guard.)
    import fcntl

    lock_path = out_path + ".merge.lock"
    lock_fd = os.open(lock_path, os.O_CREAT | os.O_WRONLY)
    try:
        fcntl.flock(lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        os.close(lock_fd)
        return 0
    try:
        with open(out_path, "a") as out:
            for _, p in shards:
                # Claim via atomic rename: each shard is consumed exactly
                # once instead of racing glob→open→unlink.
                claimed = p + ".merging"
                try:
                    os.rename(p, claimed)
                except FileNotFoundError:
                    continue
                with open(claimed) as fh:
                    out.write(fh.read())
                os.unlink(claimed)
                n += 1
    finally:
        # closing releases the flock; the (empty) lockfile stays — safe to
        # leave, and unlinking would race a concurrent locker
        os.close(lock_fd)
    return n


def barrier_and_merge(out_paths) -> None:
    """In a live jax.distributed job: block until every host finished its
    windows, then host 0 merges all shards. No-op otherwise (env-simulated
    hosts are independent processes; the caller merges explicitly)."""
    try:
        import jax

        client = jax._src.distributed.global_state.client
    except Exception:
        client = None
    if client is None:
        return
    import jax

    # A tiny global psum doubles as the barrier.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mdtpu_extract_shards")
    if jax.process_index() == 0:
        for p in out_paths:
            if p:
                merge_shards(p)
    multihost_utils.sync_global_devices("mdtpu_extract_merged")


def _main(argv):
    """`python -m methyldackel_tpu.parallel.distributed merge-shards PATH...`
    finalizes an env-simulated multi-host run after every host exits."""
    if len(argv) >= 2 and argv[0] == "merge-shards":
        for p in argv[1:]:
            n = merge_shards(p)
            print(f"merged {n} shards into {p}")
        return 0
    print("usage: python -m methyldackel_tpu.parallel.distributed "
          "merge-shards <out_path>...")
    return 1


if __name__ == "__main__":
    import sys

    raise SystemExit(_main(sys.argv[1:]))
