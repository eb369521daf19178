#!/bin/bash
# nerf-hugs-tpu workflow script (single JAX environment — no env switching).
# Reference workflow: scripts/train_mipnerf360_withmask.sh in cnhaox/NeRF-HuGS.
set -eu

# Edit these for your data / experiment:
DATA_DIR=${DATA_DIR:-/data/kubric_dataset}
CONFIG_NAME=${CONFIG_NAME:-kubric_1024_withmask}
EXPERIMENT=${EXPERIMENT:-$CONFIG_NAME}
SCENES=(${SCENES:-kubric_car kubric_cars kubric_bag kubric_chair kubric_pillow})
# kubric:       CONFIG_NAME=kubric_1024_withmask        SCENES=(kubric_car ...)
# phototourism: CONFIG_NAME=phototourism_1024_withmask  SCENES=(brandenburg_gate sacre_coeur taj_mahal trevi_fountain)
# distractor:   CONFIG_NAME=distractor_1024_glo4_withmask SCENES=(and-bot crab t_balloon_statue yoda)

for SCENE in "${SCENES[@]}"; do
  SCENE_DIR="${DATA_DIR}/${SCENE}"
  CHECKPOINT_DIR=./nerf_results/"$EXPERIMENT"/"$SCENE"
  python train.py \
    --gin_configs="configs/mipnerf360/${CONFIG_NAME}.gin" \
    --gin_bindings="Config.data_dir = '${SCENE_DIR}'" \
    --gin_bindings="Config.checkpoint_dir = '${CHECKPOINT_DIR}'" \
    --logtostderr
done
