#!/bin/bash
# Joint-training (JT) CDM sweep over p_flip=0.02..0.40 (one vmapped program).
cd "$(dirname "$0")/../.."
python -m ghm_tpu.train.sweep --task=cdns --job_name=CDM --sweep_shard=5 \
    --p_list=0.02:0.40:0.02 \
    --n_ttree_layer=4 --n_itree_layer=4 --n_ttree_child=3 --n_itree_child=3 \
    --flip_scale=1 --sigma=1 --batch_size=128 --variable_type=10 \
    --d_eb=128 --n_model_layer=9 --n_head=4 \
    --layernorm=True --normalize_attn=True --guide=False \
    --lr_max=1e-3 --lr_min=1e-6 --total_iters=30000 --penalty=0.1 --raw=False
