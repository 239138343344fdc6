"""Mocked-client coverage of the live jax.distributed merge branches
(parallel/distributed.barrier_and_merge, engine/mbias's live finalize) —
the paths a real multi-host slice would take, exercised by patching the
distributed global state (VERDICT r1 weak #8)."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _FakeClient:
    pass


@pytest.fixture()
def live_client(monkeypatch):
    import jax
    from jax.experimental import multihost_utils

    calls = []
    monkeypatch.setattr(jax._src.distributed.global_state, "client",
                        _FakeClient(), raising=False)
    monkeypatch.setattr(multihost_utils, "sync_global_devices",
                        lambda name: calls.append(name))
    return calls


def test_barrier_and_merge_host0_merges(tmp_path, live_client, monkeypatch):
    import jax
    from methyldackel_tpu.parallel import distributed as dist

    out = tmp_path / "out.bedGraph"
    out.write_text("header\n")
    (tmp_path / "out.bedGraph.h0.w0").write_text("w0\n")
    (tmp_path / "out.bedGraph.h1.w1").write_text("w1\n")
    (tmp_path / "out.bedGraph.h0.w2").write_text("w2\n")
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    dist.barrier_and_merge([str(out)])
    assert out.read_text() == "header\nw0\nw1\nw2\n"
    assert live_client == ["mdtpu_extract_shards", "mdtpu_extract_merged"]
    # shards consumed
    assert not list(tmp_path.glob("*.h*.w*"))


def test_barrier_and_merge_nonzero_host_waits_only(tmp_path, live_client,
                                                   monkeypatch):
    import jax
    from methyldackel_tpu.parallel import distributed as dist

    out = tmp_path / "out.bedGraph"
    out.write_text("header\n")
    shard = tmp_path / "out.bedGraph.h1.w0"
    shard.write_text("w0\n")
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    dist.barrier_and_merge([str(out)])
    # host 1 barriers but does NOT merge
    assert out.read_text() == "header\n"
    assert shard.exists()
    assert live_client == ["mdtpu_extract_shards", "mdtpu_extract_merged"]


def test_barrier_and_merge_noop_without_client(tmp_path):
    from methyldackel_tpu.parallel import distributed as dist

    out = tmp_path / "o.bedGraph"
    out.write_text("x\n")
    (tmp_path / "o.bedGraph.h0.w0").write_text("y\n")
    dist.barrier_and_merge([str(out)])  # no client → untouched
    assert out.read_text() == "x\n"


def test_mbias_live_finalize_host0(tmp_path, live_client, monkeypatch):
    """mbias's live multi-host branch: every host writes a counter shard,
    syncs, and host 0 merges + renders (engine/mbias.py)."""
    import shutil
    import jax
    from methyldackel_tpu.engine import mbias as mb

    for f in os.listdir("/root/reference/tests"):
        if f.startswith(("ct100", "ct_aln")):
            shutil.copy(os.path.join("/root/reference/tests", f), tmp_path)
    monkeypatch.setenv("MDTPU_NUM_HOSTS", "2")
    monkeypatch.setenv("MDTPU_ENGINE", "host")
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        # host 1 first: writes its shard, returns without rendering
        monkeypatch.setenv("MDTPU_HOST_ID", "1")
        rc = mb.mbias_main(["--txt", "--noSVG", "ct100.fa", "ct_aln.bam"])
        assert rc == 0
        shards = list(tmp_path.glob("*.mbias_counters.h1.npy"))
        assert shards
        # host 0 with a live client: computes, syncs, merges every shard
        monkeypatch.setenv("MDTPU_HOST_ID", "0")
        rc = mb.mbias_main(["--txt", "--noSVG", "ct100.fa", "ct_aln.bam"])
        assert rc == 0
        assert "mdtpu_mbias_shards" in live_client
        assert not list(tmp_path.glob("*.mbias_counters.h*.npy"))
    finally:
        os.chdir(cwd)


def test_mbias_live_finalize_matches_single_host(tmp_path, live_client,
                                                 monkeypatch, capsys):
    """Merged 2-host counters == single-host counters, byte-for-byte on the
    --txt rendering."""
    import shutil
    import jax
    from methyldackel_tpu.engine import mbias as mb

    for f in os.listdir("/root/reference/tests"):
        if f.startswith(("cg100", "cg_aln")):
            shutil.copy(os.path.join("/root/reference/tests", f), tmp_path)
    monkeypatch.setenv("MDTPU_ENGINE", "host")
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        monkeypatch.setenv("MDTPU_NUM_HOSTS", "2")
        # tiny chunk so both hosts own windows
        args = ["--txt", "--noSVG", "--chunkSize", "40", "-q", "2",
                "cg100.fa", "cg_aln.bam"]
        monkeypatch.setenv("MDTPU_HOST_ID", "1")
        assert mb.mbias_main(args) == 0
        capsys.readouterr()
        monkeypatch.setenv("MDTPU_HOST_ID", "0")
        assert mb.mbias_main(args) == 0
        two_host = capsys.readouterr().out
        monkeypatch.delenv("MDTPU_NUM_HOSTS")
        monkeypatch.delenv("MDTPU_HOST_ID")
        assert mb.mbias_main(args) == 0
        single = capsys.readouterr().out
        assert two_host == single and len(single) > 0
    finally:
        os.chdir(cwd)
