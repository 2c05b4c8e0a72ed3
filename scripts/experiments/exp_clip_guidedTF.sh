#!/bin/bash
# Guided-TF CLIP sweep over p_flip=0.02..0.40 (one vmapped program).
cd "$(dirname "$0")/../.."
python -m ghm_tpu.train.sweep --task=clip --job_name=CLIP --sweep_shard=5 \
    --p_list=0.02:0.40:0.02 \
    --n_ttree_layer=4 --n_itree_layer=4 --n_ttree_child=3 --n_itree_child=3 \
    --flip_scale=1 --K=4 --batch_size=128 --variable_type=10 \
    --clip_tmodel_nlayer=5 --clip_imodel_nlayer=5 \
    --clip_tmodel_nhead=4 --clip_imodel_nhead=4 \
    --clip_tmodel_deb=128 --clip_imodel_deb=128 \
    --clip_layernorm=True --clip_attennorm=True --clip_guide=True \
    --lr_max=1e-3 --lr_min=1e-6 --total_iters=3000 --penalty=1e-3 --raw=False
