#!/bin/bash
# nerf-hugs-tpu workflow script (single JAX environment — no env switching).
# Reference workflow: scripts/metrics_nerfacto_withmask.sh in cnhaox/NeRF-HuGS.
set -eu

# Edit these for your data / experiment:
DATA_DIR=${DATA_DIR:-/data/kubric_dataset}
CONFIG_NAME=${CONFIG_NAME:-kubric_nerfacto_withmask}
SCENES=(${SCENES:-kubric_car kubric_cars kubric_bag kubric_chair kubric_pillow})

python metrics.py \
  --experiment_dir ./nerf_results/"$CONFIG_NAME" \
  --scene_names "${SCENES[@]}" \
  --image_type "${IMAGE_TYPE:-whole}" \
  --save --output_dir ./nerf_results/"$CONFIG_NAME"/metrics
# Phototourism protocol: IMAGE_TYPE=half_right (left half finetunes embeds).
