#!/bin/bash
# nerf-hugs-tpu workflow script (single JAX environment — no env switching).
# Reference workflow: scripts/metrics_mipnerf360_robustnerf0.8.sh in cnhaox/NeRF-HuGS.
set -eu

# Edit these for your data / experiment:
DATA_DIR=${DATA_DIR:-/data/kubric_dataset}
CONFIG_NAME=${CONFIG_NAME:-kubric_1024_robustnerf0.8}
EXPERIMENT=${EXPERIMENT:-$CONFIG_NAME}
SCENES=(${SCENES:-kubric_car kubric_cars kubric_bag kubric_chair kubric_pillow})
# kubric:       CONFIG_NAME=kubric_1024_robustnerf0.8        SCENES=(kubric_car ...)
# phototourism: CONFIG_NAME=phototourism_1024_robustnerf0.8  SCENES=(brandenburg_gate sacre_coeur taj_mahal trevi_fountain)
# distractor:   CONFIG_NAME=distractor_1024_glo4_robustnerf0.8 SCENES=(and-bot crab t_balloon_statue yoda)

python metrics.py \
  --experiment_dir ./nerf_results/"$EXPERIMENT" \
  --scene_names "${SCENES[@]}" \
  --image_type "${IMAGE_TYPE:-whole}" \
  --save --output_dir ./nerf_results/"$EXPERIMENT"/metrics
# Phototourism protocol: IMAGE_TYPE=half_right (left half finetunes embeds).
