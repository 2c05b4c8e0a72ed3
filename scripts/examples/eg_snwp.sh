#!/bin/bash
# Single sequential next-word-prediction training demo (needs a trained
# CLIP checkpoint under logs/CLIP for the matching tree folder).
cd "$(dirname "$0")/../.."
python -m ghm_tpu.train.train_sequential_NWP \
    --clip_feature=TF \
    --n_ttree_layer=4 --n_itree_layer=4 --n_ttree_child=3 --n_itree_child=3 \
    --p_ttree_flip=0.2 --p_itree_flip=0.2 --flip_scale=1 \
    --batch_size=128 --variable_type=10 \
    --d_eb=256 --n_model_layer=9 --n_head=4 \
    --layernorm=True --normalize_attn=True --guide=False \
    --lr_max=1e-3 --lr_min=1e-6 --total_iters=30000 --penalty=0.001 --raw=True
