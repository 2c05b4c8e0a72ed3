"""Train the reference (torch) standard-TF CLIP at p=0.2 on this host, to
establish what loss the reference pipeline actually reaches here.
Writes the final loss history to /root/repo/ref_clip_train.npz."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/reference/src")
import torch
from ghmclip.data.data_random_GHM import ClipSampler
from ghmclip.models.model import EncoderTransformer, GuidedClipLoss, seed_everything
from ghmclip.models.optimizer import AdamW, get_lr_cosine_schedule

V, K, B, TOTAL = 10, 4, 128, 3001
p_y = np.ones(V) / V
sampler = ClipSampler([4, 4], [3, 3], [p_y, p_y], [0.2, 0.2], K=K,
                      flip_scale=1.0, variable_type=V,
                      translation_invariance=True, seedtree=42)
seed_everything(224)
def make():
    return EncoderTransformer(n_token=81, num_class=V, n_embd=128, n_layer=5,
                              n_guided_layer=4, n_head=4, n_mlp_multiplier=4,
                              activation="softmax", mlp=True,
                              normalize_attn=True, layernorm=True, guide=False)
tmodel, imodel = make(), make()
loss = GuidedClipLoss(K, B, penalty=1e-3, guide=False)
opt = AdamW(list(tmodel.parameters()) + list(imodel.parameters()), lr=None)
hist = np.zeros(TOTAL)
t0 = time.time()
for it in range(TOTAL):
    opt.zero_grad()
    rt, ri = sampler.get_batch(device="cpu", batch_size=B, guide=False)
    out = loss(tmodel(rt[0]), imodel(ri[0]), [None, None])
    out[0].backward()
    hist[it] = out[0].item()
    torch.nn.utils.clip_grad_norm_(list(tmodel.parameters()) + list(imodel.parameters()), 1.0)
    opt.set_lr(get_lr_cosine_schedule(it, 3e-4, 3e-7, 0, 3000))
    opt.step()
    if it % 100 == 0:
        print(f"it {it} loss(win) {hist[max(0,it-100):it+1].mean():.4f} "
              f"{time.time()-t0:.0f}s", flush=True)
np.savez("/root/repo/ref_clip_train.npz", hist=hist)
print("final100:", hist[-100:].mean())
