#!/bin/bash
# Sequential CDM standardTF sweep over p_flip=0.02..0.40.  Sequential
# stacks load a per-p frozen CLIP encoder checkpoint, so each p trains in
# series on the chip (train the CLIP sweeps first).
cd "$(dirname "$0")/../.."
for p in 0.02 0.04 0.06 0.08 0.1 0.12 0.14 0.16 0.18 0.2 0.22 0.24 0.26 0.28 0.3 0.32 0.34 0.36 0.38 0.4; do
  python -m ghm_tpu.train.train_sequential_DNS --job_name=CDM \
      --clip_feature=TF \
      --n_ttree_layer=4 --n_itree_layer=4 --n_ttree_child=3 --n_itree_child=3 \
      --p_ttree_flip=$p --p_itree_flip=$p --flip_scale=1 --sigma=1 \
      --batch_size=128 --variable_type=10 \
      --d_eb=128 --n_model_layer=9 --n_head=4 \
      --layernorm=True --normalize_attn=True --guide=False \
      --lr_max=1e-3 --lr_min=1e-6 --total_iters=30000 --penalty=0.1 --raw=False
done
