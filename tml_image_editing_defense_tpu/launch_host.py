"""Per-host pod-sweep entrypoint: ``python -m tml_image_editing_defense_tpu.launch_host``.

This is the program ``scripts/launch_tpu_pod.sh`` runs on every host of a TPU
pod slice (reference analogs: the hand-split two-GPU launch at
``run_all.py:16-21`` and the SLURM batch body, ``tml_project.slurm:13-16``).
One process per host: ``jax.distributed`` wires the hosts together, each host
takes a disjoint strided slice of the image list
(:func:`~tml_image_editing_defense_tpu.parallel.hosts.shard_for_host`) and
runs the real sweep over its local-chip mesh — no tensor traffic crosses DCN.

Living in the package (instead of a heredoc inside the shell script) makes
the exact per-host program executable in CI: the launcher's ``--local-sim``
mode runs THIS module N times on CPU processes, and
``tests/test_hosts.py::test_launcher_local_sim_matches_single_host`` asserts
the union of the hosts' artifacts is byte-identical to a single-host run.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tml_image_editing_defense_tpu.launch_host",
        description="Run this host's shard of a pod-wide immunization sweep.",
    )
    p.add_argument("images_dir", type=Path)
    p.add_argument("output_root", type=Path)
    p.add_argument(
        "--coordinator",
        default=None,
        help="host:port for jax.distributed (local-sim / manually wired pods); "
        "omit on TPU VMs, where initialize() auto-detects the topology",
    )
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument(
        "--platform",
        default=None,
        help="force a jax platform before initialization "
        "(the launcher's --local-sim mode passes 'cpu')",
    )
    p.add_argument(
        "--config-json",
        type=Path,
        default=None,
        help="JSON {'sweep': SweepConfig field overrides, 'train_overrides': "
        "{...}} — the local-sim / test hook for non-default sweep grids",
    )
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        # Must land before backend init; the axon TPU plugin ignores the
        # JAX_PLATFORMS env var, so the config update is the reliable route.
        jax.config.update("jax_platforms", args.platform)
    if args.coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        jax.distributed.initialize()  # TPU pod: topology auto-detected

    from tml_image_editing_defense_tpu import api
    from tml_image_editing_defense_tpu.configs import SweepConfig
    from tml_image_editing_defense_tpu.parallel.hosts import (
        list_sweep_images,
        shard_for_host,
    )

    sweep_overrides: dict = {}
    train_overrides = None
    if args.config_json is not None:
        blob = json.loads(args.config_json.read_text())
        # JSON has no tuples; grid fields arrive as lists
        sweep_overrides = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in blob.get("sweep", {}).items()
        }
        train_overrides = blob.get("train_overrides")

    cfg = SweepConfig(
        images_dir=args.images_dir, output_root=args.output_root, **sweep_overrides
    )
    # Host-shard the image list (the DCN tier: disjoint work, no collectives)
    mine = shard_for_host(
        list_sweep_images(cfg.images_dir), jax.process_index(), jax.process_count()
    )
    api.sweep(cfg, image_paths=mine, data_parallel=True,
              train_overrides=train_overrides)
    print(
        f"HOST_SWEEP_DONE process={jax.process_index()}/{jax.process_count()} "
        f"images={[p.name for p in mine]}"
    )


if __name__ == "__main__":
    main()
