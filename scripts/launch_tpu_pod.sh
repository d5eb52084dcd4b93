#!/usr/bin/env bash
# TPU-pod launcher — the cluster-launch equivalent of the reference's SLURM
# batch script (tml_project.slurm:1-21), rebuilt for TPU VMs.
#
# The reference's "distribution" was a hand-split image list pinned to two
# GPUs (run_all.py:16-21).  Here every host of a TPU pod slice runs the same
# sweep entrypoint; jax.distributed wires the hosts together and the sweep's
# data-parallel mesh shards images over each host's local chips
# (parallel/sweep.py).  Host-sharding of the image list is by process index
# (parallel/hosts.py::shard_for_host), so no tensor traffic crosses DCN —
# each host only reads its own slice of inputs.
#
# Usage (from a machine with gcloud access to the pod):
#   scripts/launch_tpu_pod.sh <tpu-name> <zone> <images-dir> <output-root>
#
# Dry run (no pod, no gcloud — prints the per-host image shards the launch
# would execute, using the same sharding code path):
#   scripts/launch_tpu_pod.sh --dry-run <num-hosts> <images-dir>
set -euo pipefail

if [[ "${1:-}" == "--dry-run" ]]; then
  NUM_HOSTS=${2:?num hosts}
  IMAGES_DIR=${3:?images dir}
  python - "$NUM_HOSTS" "$IMAGES_DIR" <<'PY'
import sys
from tml_image_editing_defense_tpu.parallel.hosts import describe_host_shards
print(describe_host_shards(sys.argv[2], int(sys.argv[1])))
PY
  exit 0
fi

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
IMAGES_DIR=${3:?images dir}
OUTPUT_ROOT=${4:?output root}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all --command "
  cd \$HOME/tml_image_editing_defense_tpu &&
  python - <<'PY'
import jax
jax.distributed.initialize()          # multi-host: one process per host
from pathlib import Path
from tml_image_editing_defense_tpu import api
from tml_image_editing_defense_tpu.configs import SweepConfig
from tml_image_editing_defense_tpu.parallel.hosts import (
    list_sweep_images, shard_for_host,
)

cfg = SweepConfig(images_dir=Path('$IMAGES_DIR'),
                  output_root=Path('$OUTPUT_ROOT'))
# host-shard the image list (the DCN tier: no inter-host tensor traffic)
mine = shard_for_host(list_sweep_images(cfg.images_dir),
                      jax.process_index(), jax.process_count())
api.sweep(cfg, image_paths=mine)
PY
"
