#!/bin/bash
# nerf-hugs-tpu workflow script (single JAX environment — no env switching).
# Reference workflow: scripts/train_nerfacto_withmask.sh in cnhaox/NeRF-HuGS.
set -eu

# Edit these for your data / experiment:
DATA_DIR=${DATA_DIR:-/data/kubric_dataset}
CONFIG_NAME=${CONFIG_NAME:-kubric_nerfacto_withmask}
SCENES=(${SCENES:-kubric_car kubric_cars kubric_bag kubric_chair kubric_pillow})

for SCENE in "${SCENES[@]}"; do
  SCENE_DIR="${DATA_DIR}/${SCENE}"
  CHECKPOINT_DIR=./nerf_results/"$CONFIG_NAME"/"$SCENE"
  python train.py \
    --config "configs/nerfacto/${CONFIG_NAME}.yml" \
    --data_dir "${SCENE_DIR}" \
    --save_dir "${CHECKPOINT_DIR}"
done
