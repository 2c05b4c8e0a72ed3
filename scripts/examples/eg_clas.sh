#!/bin/bash
# Single classification training demo (reference train_CLS surface).
cd "$(dirname "$0")/../.."
python -m ghm_tpu.train.train_CLS \
    --batch_size=128 --variable_type=10 \
    --d_eb=128 --n_model_layer=5 --n_head=4 \
    --layernorm=True --normalize_attn=True --guide=False \
    --lr_max=1e-3 --lr_min=1e-6 --total_iters=3000 --penalty=0.1 --raw=True
