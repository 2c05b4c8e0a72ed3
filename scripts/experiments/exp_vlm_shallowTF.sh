#!/bin/bash
# Sequential VLM shallowTF sweep over p_flip=0.02..0.40 — trained as ONE
# vmapped program with the per-p frozen CLIP encoders stacked on the sweep
# axis (train the CLIP sweeps first).
cd "$(dirname "$0")/../.."
python -m ghm_tpu.train.sweep --task=snwp --job_name=VLM --sweep_shard=5 \
    --p_list=0.02:0.40:0.02 --clip_feature=TF \
    --n_ttree_layer=4 --n_itree_layer=4 --n_ttree_child=3 --n_itree_child=3 \
    --flip_scale=1  --batch_size=128 --variable_type=10 \
    --d_eb=256 --n_model_layer=1 --n_head=4 \
    --layernorm=True --normalize_attn=True --guide=False \
    --lr_max=1e-3 --lr_min=1e-6 --total_iters=30000 --penalty=0.001 --raw=False
