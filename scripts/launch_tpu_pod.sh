#!/usr/bin/env bash
# TPU-pod launcher — the cluster-launch equivalent of the reference's SLURM
# batch script (tml_project.slurm:1-21), rebuilt for TPU VMs.
#
# The reference's "distribution" was a hand-split image list pinned to two
# GPUs (run_all.py:16-21).  Here every host of a TPU pod slice runs the same
# per-host sweep program (tml_image_editing_defense_tpu/launch_host.py);
# jax.distributed wires the hosts together and the sweep's data-parallel mesh
# shards images over each host's local chips (parallel/sweep.py).
# Host-sharding of the image list is by process index
# (parallel/hosts.py::shard_for_host), so no tensor traffic crosses DCN —
# each host only reads its own slice of inputs.
#
# Usage (from a machine with gcloud access to the pod):
#   scripts/launch_tpu_pod.sh <tpu-name> <zone> <images-dir> <output-root>
#
# Dry run (no pod, no gcloud — prints the per-host image shards the launch
# would execute, using the same sharding code path):
#   scripts/launch_tpu_pod.sh --dry-run <num-hosts> <images-dir>
#
# Local simulation (no pod — executes the REAL per-host program N times as
# local CPU processes wired by jax.distributed; CI runs this and asserts the
# union of artifacts equals a single-host run):
#   scripts/launch_tpu_pod.sh --local-sim <num-hosts> <images-dir> \
#       <output-root> [config-json]
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

if [[ "${1:-}" == "--local-sim" ]]; then
  NUM_HOSTS=${2:?num hosts}
  IMAGES_DIR=${3:?images dir}
  OUTPUT_ROOT=${4:?output root}
  CONFIG_JSON=${5:-}
  PORT=$(python - <<'PY'
import socket
s = socket.socket()
s.bind(("localhost", 0))
print(s.getsockname()[1])
s.close()
PY
)
  EXTRA=()
  if [[ -n "$CONFIG_JSON" ]]; then EXTRA=(--config-json "$CONFIG_JSON"); fi
  pids=()
  for ((i = 0; i < NUM_HOSTS; i++)); do
    python -m tml_image_editing_defense_tpu.launch_host \
      "$IMAGES_DIR" "$OUTPUT_ROOT" \
      --coordinator "localhost:$PORT" --num-processes "$NUM_HOSTS" \
      --process-id "$i" --platform cpu "${EXTRA[@]}" &
    pids+=($!)
  done
  rc=0
  for pid in "${pids[@]}"; do wait "$pid" || rc=1; done
  exit $rc
fi

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
IMAGES_DIR=${3:?images dir}
OUTPUT_ROOT=${4:?output root}

# One process per host runs the SAME module the --local-sim mode executes in
# CI; on TPU VMs jax.distributed.initialize() auto-detects the topology.
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all --command "
  cd \$HOME/tml_image_editing_defense_tpu &&
  python -m tml_image_editing_defense_tpu.launch_host '$IMAGES_DIR' '$OUTPUT_ROOT'
"
