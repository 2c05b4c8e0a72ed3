#!/bin/bash
# Train the full p_flip=0.20 model suite (the headline operating point of
# Fig. 2) sequentially on one TPU chip, then stage logs/ -> checkpoints/.
#
# Variants and hyperparameters follow the reference experiment scripts
# (scripts/experiments/exp_{clip,cdm,vlm}_*.sh) at p=0.20 only.
#
# NOTE: on hosts where the TPU is reached through a one-claim-per-process
# relay (see CLAUDE.md), prefer the in-process driver
#   python scripts/train_suite.py --stage
# which runs the same eleven tasks under a single device claim.
set -e
cd "$(dirname "$0")/.."
P=${P:-0.2}

COMMON_TREE="--n_ttree_layer=4 --n_itree_layer=4 --n_ttree_child=3 --n_itree_child=3 \
  --p_ttree_flip=$P --p_itree_flip=$P --flip_scale=1 --batch_size=128 --variable_type=10"

echo "=== CLIP standard TF ==="
python -m ghm_tpu.train.train_CLIP --job_name=CLIP $COMMON_TREE --K=4 \
  --clip_tmodel_nlayer=5 --clip_imodel_nlayer=5 --clip_tmodel_nhead=4 --clip_imodel_nhead=4 \
  --clip_tmodel_deb=128 --clip_imodel_deb=128 --clip_layernorm=True --clip_attennorm=True \
  --clip_guide=False --lr_max=3e-4 --lr_min=3e-7 --total_iters=3000 --penalty=1e-3 \
  --raw=False --wandb_logging=False

echo "=== CLIP guided TF ==="
python -m ghm_tpu.train.train_CLIP --job_name=CLIP $COMMON_TREE --K=4 \
  --clip_tmodel_nlayer=5 --clip_imodel_nlayer=5 --clip_tmodel_nhead=4 --clip_imodel_nhead=4 \
  --clip_tmodel_deb=128 --clip_imodel_deb=128 --clip_layernorm=True --clip_attennorm=True \
  --clip_guide=True --lr_max=1e-3 --lr_min=1e-6 --total_iters=3000 --penalty=1e-3 \
  --raw=False --wandb_logging=False

echo "=== CLIP shallow TF ==="
python -m ghm_tpu.train.train_CLIP --job_name=CLIP $COMMON_TREE --K=4 \
  --clip_tmodel_nlayer=1 --clip_imodel_nlayer=1 --clip_tmodel_nhead=4 --clip_imodel_nhead=4 \
  --clip_tmodel_deb=128 --clip_imodel_deb=128 --clip_layernorm=True --clip_attennorm=True \
  --clip_guide=False --lr_max=3e-4 --lr_min=3e-7 --total_iters=3000 --penalty=1e-3 \
  --raw=False --wandb_logging=False

echo "=== CDM guided (GT, joint) ==="
python -m ghm_tpu.train.train_CDNS --job_name=CDM $COMMON_TREE --sigma=1 \
  --d_eb=128 --n_model_layer=9 --n_head=4 --layernorm=True --normalize_attn=True \
  --guide=True --lr_max=1e-2 --lr_min=1e-5 --total_iters=30000 --penalty=0.1 \
  --raw=False --wandb_logging=False

echo "=== CDM joint (JT) ==="
python -m ghm_tpu.train.train_CDNS --job_name=CDM $COMMON_TREE --sigma=1 \
  --d_eb=128 --n_model_layer=9 --n_head=4 --layernorm=True --normalize_attn=True \
  --guide=False --lr_max=1e-3 --lr_min=1e-6 --total_iters=30000 --penalty=0.1 \
  --raw=False --wandb_logging=False

echo "=== CDM sequential standard (StT) ==="
python -m ghm_tpu.train.train_sequential_DNS --job_name=CDM $COMMON_TREE --sigma=1 \
  --clip_feature=TF --d_eb=128 --n_model_layer=9 --n_head=4 --layernorm=True \
  --normalize_attn=True --guide=False --lr_max=1e-3 --lr_min=1e-6 --total_iters=30000 \
  --penalty=0.1 --raw=False --wandb_logging=False

echo "=== CDM sequential shallow (ShT) ==="
python -m ghm_tpu.train.train_sequential_DNS --job_name=CDM $COMMON_TREE --sigma=1 \
  --clip_feature=TF --d_eb=128 --n_model_layer=1 --n_head=4 --layernorm=True \
  --normalize_attn=True --guide=False --lr_max=1e-3 --lr_min=1e-6 --total_iters=30000 \
  --penalty=0.1 --raw=False --wandb_logging=False

echo "=== VLM guided (GT, joint) ==="
python -m ghm_tpu.train.train_NWP --job_name=VLM $COMMON_TREE \
  --d_eb=256 --n_model_layer=9 --n_head=4 --layernorm=True --normalize_attn=True \
  --guide=True --lr_max=1e-3 --lr_min=1e-6 --total_iters=30000 --penalty=0.001 \
  --raw=False --wandb_logging=False

echo "=== VLM joint (JT) ==="
python -m ghm_tpu.train.train_NWP --job_name=VLM $COMMON_TREE \
  --d_eb=256 --n_model_layer=9 --n_head=4 --layernorm=True --normalize_attn=True \
  --guide=False --lr_max=3e-4 --lr_min=3e-7 --total_iters=30000 --penalty=0.001 \
  --raw=False --wandb_logging=False

echo "=== VLM sequential standard (StT) ==="
python -m ghm_tpu.train.train_sequential_NWP --job_name=VLM $COMMON_TREE \
  --clip_feature=TF --d_eb=256 --n_model_layer=9 --n_head=4 --layernorm=True \
  --normalize_attn=True --guide=False --lr_max=1e-3 --lr_min=1e-6 --total_iters=30000 \
  --penalty=0.001 --raw=False --wandb_logging=False

echo "=== VLM sequential shallow (ShT) ==="
python -m ghm_tpu.train.train_sequential_NWP --job_name=VLM $COMMON_TREE \
  --clip_feature=TF --d_eb=256 --n_model_layer=1 --n_head=4 --layernorm=True \
  --normalize_attn=True --guide=False --lr_max=1e-3 --lr_min=1e-6 --total_iters=30000 \
  --penalty=0.001 --raw=False --wandb_logging=False

echo "=== staging logs -> checkpoints ==="
for fam in CLIP CDM VLM; do
  mkdir -p checkpoints
  cp -r "logs/$fam" checkpoints/ 2>/dev/null || true
done
echo "p=$P suite complete"
