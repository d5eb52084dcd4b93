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


# What launch_tpu_pod.sh runs per host, reduced to tiny shapes: derive this
# host's image shard, then run the REAL sweep over it (each host's local
# 8-device mesh takes the data-parallel fused path when it has >1 image).
# argv: mode("single"|process_id) images_dir output_root port
_SWEEP_WORKER = """
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
mode, imgs_dir, out_root, port = sys.argv[1:5]

import tml_image_editing_defense_tpu.api as api
from tml_image_editing_defense_tpu.configs import SweepConfig
from tml_image_editing_defense_tpu.parallel.hosts import (
    list_sweep_images, shard_for_host)

api.evaluate = lambda *a, **k: []   # this test compares training artifacts

OVERRIDES = dict(
    model_family="tiny", image_size=32, n_denoising_steps_per_iteration=2,
    limit_timesteps=False, derive_norm_hyperparams=False, grad_reps=1,
    apply_loss_on_latents=True, apply_loss_on_images=False,
    perturbation_loss_lambda=0.0, enable_visualization=False,
    eps=0.1, step_size=0.02, norm_type="linf", remat_policy="none",
)
cfg = SweepConfig(
    images_dir=Path(imgs_dir), output_root=Path(out_root),
    n_prompts_grid=(1,), n_noises_grid=(1,), n_optimization_steps=2,
    use_lcm=True, seed=3,
)
images = list_sweep_images(imgs_dir)
if mode == "single":
    mine = images
    data_parallel = False          # the serial oracle
else:
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=2, process_id=int(mode))
    mine = shard_for_host(images, jax.process_index(), jax.process_count())
    data_parallel = True           # per-host local-mesh DP, the real pod path
api.sweep(cfg, image_paths=mine, data_parallel=data_parallel,
          train_overrides=OVERRIDES)
print("SWEEP_DONE", mode, [p.name for p in mine])
"""


def _run_workers(scripts_and_args, timeout=600):
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, *args], stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True, cwd=REPO, env=env)
        for args in scripts_and_args
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


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


def test_two_host_sweep_matches_single_host(tmp_path):
    """The multi-host tier EXECUTES: two `jax.distributed` processes each run
    the real per-host sweep path (strided image shard → local-mesh
    data-parallel `sweep`) and the union of their artifacts is byte-identical
    to a single-host run over the full image list.  This is
    `launch_tpu_pod.sh`'s execution contract (reference analog: the manual
    two-GPU split at run_all.py:16-21), previously evidenced only by a
    dry-run and an init smoke test."""
    import socket

    import numpy as np
    from PIL import Image

    imgs_dir = tmp_path / "imgs"
    imgs_dir.mkdir()
    rng = np.random.default_rng(21)
    for i in range(3):
        arr = rng.uniform(0, 255, (40, 40, 3)).astype(np.uint8)
        Image.fromarray(arr).save(imgs_dir / f"im{i}.png")

    script = tmp_path / "sweep_worker.py"
    script.write_text(_SWEEP_WORKER)
    single_root = tmp_path / "single"
    multi_root = tmp_path / "multi"

    outs = _run_workers(
        [[str(script), "single", str(imgs_dir), str(single_root), "0"]])
    assert outs[0][0] == 0, f"single-host sweep failed:\n{outs[0][2][-2000:]}"

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    outs = _run_workers(
        [[str(script), str(pid), str(imgs_dir), str(multi_root), str(port)]
         for pid in range(2)])
    shard_names = []
    for rc, out, err in outs:
        assert rc == 0, f"host worker failed:\n{err[-2000:]}"
        assert "SWEEP_DONE" in out
        shard_names.append(out)

    # every host did real, disjoint work (3 images over 2 hosts: 2 + 1)
    assert "'im0.png', 'im2.png'" in shard_names[0]
    assert "'im1.png'" in shard_names[1]

    singles = sorted(p.relative_to(single_root)
                     for p in single_root.rglob("adversarial_image.png"))
    assert len(singles) == 3
    for rel in singles:
        for artifact in ("adversarial_image.png", "noise.npz"):
            a = (single_root / rel.parent / artifact).read_bytes()
            b = (multi_root / rel.parent / artifact).read_bytes()
            assert a == b, f"{rel.parent}/{artifact} differs across tiers"
