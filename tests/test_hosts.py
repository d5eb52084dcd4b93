"""Multi-host (DCN) tier tests: host-sharding math, the pod launcher's
--dry-run path, and a 2-process jax.distributed CPU smoke test (SURVEY.md §2
parallelism inventory; VERDICT r2 item 8 — the tier previously had no
executable evidence)."""

import subprocess
import sys
from pathlib import Path

import pytest

from tml_image_editing_defense_tpu.parallel.hosts import (
    describe_host_shards,
    list_sweep_images,
    shard_for_host,
)

REPO = Path(__file__).resolve().parents[1]


def test_shard_for_host_partitions_exactly():
    items = [f"im{i}" for i in range(11)]
    for count in (1, 2, 3, 4, 8, 11, 13):
        shards = [shard_for_host(items, h, count) for h in range(count)]
        # union == input, disjoint, order-preserving within a shard
        flat = [x for s in shards for x in s]
        assert sorted(flat) == sorted(items)
        assert len(flat) == len(items)
        # balanced: sizes differ by at most 1 (the reference's hand-halving,
        # run_all.py:17-21, is the count=2 special case)
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1


def test_shard_for_host_validates():
    with pytest.raises(ValueError):
        shard_for_host([1], 0, 0)
    with pytest.raises(ValueError):
        shard_for_host([1], 2, 2)
    with pytest.raises(ValueError):
        shard_for_host([1], -1, 2)


def test_list_sweep_images_deterministic(tmp_path):
    for name in ("b.png", "a.jpg", "c.jpeg", "skip.txt", "d.gif"):
        (tmp_path / name).write_bytes(b"x")
    imgs = list_sweep_images(tmp_path)
    assert [p.name for p in imgs] == ["a.jpg", "b.png", "c.jpeg"]


def test_launcher_dry_run(tmp_path):
    """The launch script's --dry-run executes the real sharding code path."""
    for i in range(5):
        (tmp_path / f"im{i}.png").write_bytes(b"x")
    out = subprocess.run(
        ["bash", str(REPO / "scripts" / "launch_tpu_pod.sh"),
         "--dry-run", "4", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    text = out.stdout
    assert "5 images" in text and "4 hosts" in text
    assert "host 0: 2 images" in text     # 5 over 4 hosts: 2,1,1,1
    assert "host 3: 1 images" in text
    assert describe_host_shards(tmp_path, 4) == text.strip()


_DIST_WORKER = """
import sys
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%d",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
from tml_image_editing_defense_tpu.parallel.hosts import shard_for_host
mine = shard_for_host(list(range(10)), jax.process_index(), jax.process_count())
assert len(mine) == 5
print("DIST_OK", pid, mine)
"""


def test_two_process_jax_distributed_cpu(tmp_path):
    """The launcher's jax.distributed.initialize() wiring, exercised for real
    with two CPU processes on this machine (coordinator + worker)."""
    import os
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_DIST_WORKER % port)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"distributed worker failed:\n{err[-2000:]}"
        assert "DIST_OK" in out
