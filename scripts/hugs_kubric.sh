#!/bin/bash
# nerf-hugs-tpu workflow script (single JAX environment — no env switching).
# Reference workflow: scripts/hugs_kubric.sh in cnhaox/NeRF-HuGS.
set -eu

# Edit these for your data / experiment:
DATA_DIR=${DATA_DIR:-/data/kubric_dataset}
CONFIG_NAME=${CONFIG_NAME:-kubric_nerfacto_gen_mask}
SCENES=(${SCENES:-kubric_car kubric_cars kubric_bag kubric_chair kubric_pillow})

for SCENE in "${SCENES[@]}"; do
  SCENE_DIR="${DATA_DIR}/${SCENE}"
  SAVE_DIR=./nerf_results/hugs_gen/"$SCENE"
  # 1. Partial nerfacto training (~3000 steps, charb loss).
  python train.py \
    --config configs/nerfacto/kubric_nerfacto_gen_mask.yml \
    --data_dir "${SCENE_DIR}" --save_dir "${SAVE_DIR}"
  # 2. Render the TRAIN split pred/gt pairs for the heuristics.
  python eval.py \
    --config configs/nerfacto/kubric_nerfacto_gen_mask.yml \
    --data_dir "${SCENE_DIR}" --save_dir "${SAVE_DIR}" \
    --eval_data train --original_name --only_pred_gt
  # 3. Heuristics-guided segmentation -> static_masks/.
  python generate_static_mask.py \
    --images "${SAVE_DIR}/train_preds" \
    --colmap "${SCENE_DIR}/sparse/0" \
    --sam_model vit_h \
    --sam_checkpoint "${SAM_CHECKPOINT:?set SAM_CHECKPOINT}" \
    --output "${SCENE_DIR}" \
    --config configs/hugs/kubric.yml
done
