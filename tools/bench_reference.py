"""Measure the reference implementation's CLIP training-step throughput.

Runs the reference (torch/numpy, /root/reference) guided-CLIP training step —
sampler.get_batch(guide=True) + dual-encoder forward/backward + AdamW — at
the paper's flagship operating point (L=4, C=3, p=0.2, B=128, L5/H4/D128
encoders) and reports steps/sec and samples/sec.  The resulting number is
recorded in bench.py as the vs_baseline denominator.

Run: python tools/bench_reference.py [n_steps]
"""

import sys
import time

import numpy as np

REF_SRC = "/root/reference/src"


def main(n_steps=6):
    sys.path.insert(0, REF_SRC)
    import torch
    from ghmclip.data.data_random_GHM import ClipSampler
    from ghmclip.models.model import EncoderTransformer, GuidedClipLoss
    from ghmclip.models.optimizer import AdamW

    V, K, B = 10, 4, 128
    p_y = np.ones(V) / V
    sampler = ClipSampler([4, 4], [3, 3], [p_y, p_y], [0.2, 0.2], K=K,
                          flip_scale=1.0, variable_type=V,
                          translation_invariance=True, seedtree=42)

    def make_model():
        return EncoderTransformer(n_token=81, num_class=V, n_embd=128,
                                  n_layer=5, n_guided_layer=4, n_head=4,
                                  n_mlp_multiplier=4, activation="softmax",
                                  mlp=True, normalize_attn=True,
                                  layernorm=True, guide=True)

    tmodel, imodel = make_model(), make_model()
    loss = GuidedClipLoss(K, B, penalty=1e-3, guide=True)
    opt = AdamW(list(tmodel.parameters()) + list(imodel.parameters()), lr=None)
    opt.set_lr(3e-4)

    # Warmup step (allocations, caches).
    def step():
        opt.zero_grad()
        res_t, res_i = sampler.get_batch(device="cpu", batch_size=B, guide=True)
        t_out = tmodel(res_t[0])
        i_out = imodel(res_i[0])
        out = loss(t_out, i_out, [res_t[2], res_i[2]])
        out[0].backward()
        torch.nn.utils.clip_grad_norm_(
            list(tmodel.parameters()) + list(imodel.parameters()), 1.0)
        opt.step()

    step()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = (time.perf_counter() - t0) / n_steps
    print(f"reference guided-CLIP train step: {dt*1000:.1f} ms/step, "
          f"{1/dt:.3f} steps/s, {B/dt:.1f} samples/s "
          f"({B*(K+1)/dt:.1f} trees/s)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
