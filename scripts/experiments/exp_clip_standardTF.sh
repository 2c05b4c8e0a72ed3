#!/bin/bash
# Standard-TF CLIP sweep over p_flip=0.02..0.40 — trained as ONE vmapped
# program on the TPU (replaces the reference's 20 background processes).
cd "$(dirname "$0")/../.."
python -m ghm_tpu.train.sweep --task=clip --job_name=CLIP --sweep_shard=5 \
    --p_list=0.02:0.40:0.02 \
    --n_ttree_layer=4 --n_itree_layer=4 --n_ttree_child=3 --n_itree_child=3 \
    --flip_scale=1 --K=4 --batch_size=128 --variable_type=10 \
    --clip_tmodel_nlayer=5 --clip_imodel_nlayer=5 \
    --clip_tmodel_nhead=4 --clip_imodel_nhead=4 \
    --clip_tmodel_deb=128 --clip_imodel_deb=128 \
    --clip_layernorm=True --clip_attennorm=True --clip_guide=False \
    --lr_max=3e-4 --lr_min=3e-7 --total_iters=3000 --penalty=1e-3 --raw=False
