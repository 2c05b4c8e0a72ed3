"""Train the reference (torch) joint-train CDM at p=0.2 on this host, as the
arbiter for the CDM excess-risk gap (PARITY.md): if the reference's own code
at the committed config (scripts/experiments/exp_cdm_jointtrain.sh) tracks the
ghm_tpu loss/compare curves, the published checkpoints were produced under
different conditions than the committed scripts record.

Config mirrors reference exp_cdm_jointtrain.sh + train_CDNS.py (lr 1e-3,
penalty 0.1, guide=False, 30k iters).  CPU-only; writes running history to
/root/repo/ref_cdm_train.npz every 100 iters so any prefix is usable, and a
full resume snapshot (model + optimizer + histories) to
/root/repo/ref_cdm_resume.pt every 500 iters so a relaunch continues instead
of restarting (round-2 lost a 7,600-iter run to a restart).
"""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/reference/src")
import torch
from ghmclip.data.data_random_GHM import ConditionalDenoiseSampler
from ghmclip.models.model import (ConditionalDenoiseEncoderTransformer,
                                  ConditionalGuidedLsLoss, LsLoss,
                                  seed_everything)
from ghmclip.models.optimizer import AdamW, get_lr_cosine_schedule

V, B, TOTAL = 10, 128, 30000
p_y = np.ones(V) / V
sampler = ConditionalDenoiseSampler([4, 4], [3, 3], [p_y, p_y], [0.2, 0.2],
                                    sigma=1.0, flip_scale=1.0,
                                    variable_type=V,
                                    translation_invariance=True, seedtree=42)
bayes, bayes_std = sampler.get_Bayes(n_eval=10000)
print(f"Bayes: {bayes:.4f} (±{bayes_std:.4f})", flush=True)

seed_everything(224)
model = ConditionalDenoiseEncoderTransformer(
    n_token=162, n_i_token=81, num_class=V, n_embd=128, n_layer=9,
    n_guided_layers=[4, 4], n_head=4, n_mlp_hidden=512,
    activation="softmax", mlp=True, normalize_attn=True, layernorm=True,
    maxnorm=False, sequential=False, guide=False)
loss = ConditionalGuidedLsLoss(penalty=0.1, guide=False)
loss_nop = LsLoss()
opt = AdamW(params=model.parameters(), lr=None)

hist = np.zeros(TOTAL)
phist = np.zeros(TOTAL)
chist = np.zeros(TOTAL)
start_it = 0
RESUME = "/root/repo/ref_cdm_resume.pt"
if os.path.exists(RESUME):
    snap = torch.load(RESUME, weights_only=False)
    model.load_state_dict(snap["model"])
    opt.load_state_dict(snap["opt"])
    start_it = int(snap["it"]) + 1
    hist[:start_it] = snap["hist"][:start_it]
    phist[:start_it] = snap["phist"][:start_it]
    chist[:start_it] = snap["chist"][:start_it]
    # Re-seed with an iteration offset: seed_everything(224) above reset the
    # global numpy RNG, so without this the resumed run would REPLAY the
    # batch sequence from iteration 0 (batches the model already trained on)
    # instead of drawing fresh data.  Offset seeding makes the resumed
    # stream an independent draw — statistically equivalent for the
    # arbiter-curve comparison, and never a replay.
    seed_everything(224 + start_it)
    print(f"resuming from snapshot at it {start_it}", flush=True)

t0 = time.time()
for it in range(start_it, TOTAL):
    opt.zero_grad()
    res_text, res_image = sampler.get_batch(device="cpu", batch_size=B,
                                            guide=False)
    posterior = torch.tensor(res_image[3], dtype=torch.float32)
    out = model(res_text[0], res_image[0])
    output = loss(out, [res_image[1], [res_text[2], res_image[2]]])[0]
    output.backward()
    phist[it] = output.item()
    hist[it] = loss_nop(out[0], res_image[1]).item()
    chist[it] = loss_nop(out[0], posterior).item()
    torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
    opt.set_lr(get_lr_cosine_schedule(it, 1e-3, 1e-6, 0, TOTAL))
    opt.step()
    if it % 100 == 0:
        np.savez("/root/repo/ref_cdm_train.npz", hist=hist, phist=phist,
                 chist=chist, bayes=bayes, upto=it)
        print(f"it {it} loss(win) {hist[max(0, it-100):it+1].mean():.4f} "
              f"compare(win) {chist[max(0, it-100):it+1].mean():.4f} "
              f"{time.time()-t0:.0f}s", flush=True)
    if it % 500 == 0 and it > start_it:
        torch.save({"model": model.state_dict(), "opt": opt.state_dict(),
                    "it": it, "hist": hist, "phist": phist, "chist": chist},
                   RESUME + ".tmp")
        os.replace(RESUME + ".tmp", RESUME)
np.savez("/root/repo/ref_cdm_train.npz", hist=hist, phist=phist, chist=chist,
         bayes=bayes, upto=TOTAL)
print("final100 loss:", hist[-100:].mean(), "compare:", chist[-100:].mean())
