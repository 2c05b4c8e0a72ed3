"""Generate optimizer/loss golden fixtures from the reference implementation.

Records: (a) reference AdamW trajectories on synthetic params/grads
(including its quirky weight-decay-at-base-lr and torch-style bias
correction), (b) grad-norm clipping coefficients, (c) the cosine schedule,
and (d) loss values of the reference loss modules on random inputs.

Run: python tools/gen_golden_optim.py
"""

import os
import sys

import numpy as np
import torch

REF_SRC = "/root/reference/src"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main():
    sys.path.insert(0, REF_SRC)
    from ghmclip.models.optimizer import AdamW, get_lr_cosine_schedule
    from ghmclip.models.model import (
        ClipLoss,
        GuidedClipLoss,
        ConditionalGuidedCELoss,
        ConditionalGuidedLsLoss,
        GuidedCELoss,
        KLdiv,
        LsLoss,
    )

    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.RandomState(0)

    # ---------------- AdamW trajectory -------------------------------
    p0 = rng.randn(4, 5).astype(np.float32)
    grads = [rng.randn(4, 5).astype(np.float32) for _ in range(5)]
    lrs = [3e-4, 2e-4, 1e-4, 5e-5, 1e-5]
    p = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = AdamW([p], lr=None, weight_decay=0.001)
    traj = []
    for g, lr in zip(grads, lrs):
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.set_lr(lr)
        opt.step()
        traj.append(p.detach().numpy().copy())
    sched = [get_lr_cosine_schedule(t, 1e-3, 1e-6, 10, 100) for t in range(0, 120, 7)]
    np.savez(os.path.join(OUT_DIR, "optim_adamw.npz"),
             p_init=p0, lrs=np.array(lrs), sched=np.array(sched),
             sched_ts=np.arange(0, 120, 7),
             **{f"g{i}": g for i, g in enumerate(grads)},
             **{f"step{i}": t for i, t in enumerate(traj)})

    # ---------------- clip_grad_norm ----------------------------------
    gs = [torch.tensor(rng.randn(3, 3).astype(np.float32)),
          torch.tensor(rng.randn(7).astype(np.float32))]
    ps = [torch.nn.Parameter(torch.zeros(3, 3)), torch.nn.Parameter(torch.zeros(7))]
    for pp, g in zip(ps, gs):
        pp.grad = g.clone()
    norm = torch.nn.utils.clip_grad_norm_(ps, 1.0)
    np.savez(os.path.join(OUT_DIR, "optim_clip.npz"),
             g0=gs[0].numpy(), g1=gs[1].numpy(),
             c0=ps[0].grad.numpy(), c1=ps[1].grad.numpy(),
             norm=np.array(norm.item()))

    # ---------------- losses -------------------------------------------
    B, K, V, T = 6, 4, 10, 9
    t_out = torch.tensor(rng.randn(B * (K + 1), V).astype(np.float32)) * 0.3
    i_out = torch.tensor(rng.randn(B * (K + 1), V).astype(np.float32)) * 0.3
    tg = [torch.tensor(rng.randn(B * (K + 1), T, V).astype(np.float32)) for _ in range(2)]
    tg_t = [torch.tensor(rng.randn(B * (K + 1), T, V).astype(np.float32)) for _ in range(2)]
    clip_plain = ClipLoss(K, B)(t_out, i_out).item()
    gclip, gdiag = GuidedClipLoss(K, B, penalty=1e-3, guide=True)(
        (t_out, tg), (i_out, tg), (tg_t, tg_t))

    logits = torch.tensor(rng.randn(B, T, V).astype(np.float32))
    labels = torch.tensor(rng.randint(0, V, (B, T)))
    # 2L+1 guide blocks with L=2: [V], [2V], [2V], [V], [V] per NWP layout
    t_guides_in = [torch.tensor(rng.randn(B, T, d).astype(np.float32))
                   for d in (V, 2 * V, 2 * V, V, V)]
    t_guides_tg = [torch.tensor(rng.randn(B, T, d).astype(np.float32))
                   for d in (V, 2 * V, 2 * V, V, V)]
    i_guides_in = [torch.tensor(rng.randn(B, 3, V).astype(np.float32)) for _ in range(2)]
    i_guides_tg = [torch.tensor(rng.randn(B, 3, V).astype(np.float32)) for _ in range(2)]
    ce_out = ConditionalGuidedCELoss(penalty=1e-3, guide=True)(
        (logits, [t_guides_in, i_guides_in]),
        (labels, [t_guides_tg, i_guides_tg]))

    pred = torch.tensor(rng.randn(B, 27).astype(np.float32))
    target = torch.tensor(rng.randn(B, 27).astype(np.float32))
    ig_in = [torch.tensor(rng.randn(B, 27, d).astype(np.float32))
             for d in (2 * V, 2 * V, 2 * V, 3 * V, 3 * V)]
    ig_tg = [torch.tensor(rng.randn(B, 27, d).astype(np.float32))
             for d in (2 * V, 2 * V, 2 * V, 3 * V, 3 * V)]
    tgt_in = [torch.tensor(rng.randn(B, 9, V).astype(np.float32)) for _ in range(2)]
    tgt_tg = [torch.tensor(rng.randn(B, 9, V).astype(np.float32)) for _ in range(2)]
    ls_out = ConditionalGuidedLsLoss(penalty=0.1, guide=True)(
        (pred, [tgt_in, ig_in]), (target, [tgt_tg, ig_tg]))

    probs = torch.softmax(torch.tensor(rng.randn(B, T, V).astype(np.float32)), dim=-1)
    kld = KLdiv()(logits, probs).item()
    lsl = LsLoss()(pred, target).item()
    gce_logits = torch.tensor(rng.randn(B, V).astype(np.float32))
    gce_labels = torch.tensor(rng.randint(0, V, (B,)))
    gce = GuidedCELoss(penaltys=[1.0, 0.05], guide=True)(
        (gce_logits, i_guides_in), (gce_labels, i_guides_tg)).item()

    np.savez(os.path.join(OUT_DIR, "losses.npz"),
             t_out=t_out.numpy(), i_out=i_out.numpy(),
             tg0=tg[0].numpy(), tg1=tg[1].numpy(),
             tgt0=tg_t[0].numpy(), tgt1=tg_t[1].numpy(),
             clip_plain=np.array(clip_plain),
             gclip=np.array(gclip.item()), gdiag=np.array(gdiag),
             logits=logits.numpy(), labels=labels.numpy(),
             **{f"tgi{i}": t.numpy() for i, t in enumerate(t_guides_in)},
             **{f"tgt_{i}": t.numpy() for i, t in enumerate(t_guides_tg)},
             **{f"igi{i}": t.numpy() for i, t in enumerate(i_guides_in)},
             **{f"igt{i}": t.numpy() for i, t in enumerate(i_guides_tg)},
             ce_total=np.array(ce_out[0].item()),
             ce_parts=np.array([ce_out[1], ce_out[2], ce_out[3], ce_out[4]]),
             pred=pred.numpy(), target=target.numpy(),
             **{f"lgi{i}": t.numpy() for i, t in enumerate(ig_in)},
             **{f"lgt{i}": t.numpy() for i, t in enumerate(ig_tg)},
             **{f"ltgi{i}": t.numpy() for i, t in enumerate(tgt_in)},
             **{f"ltgt{i}": t.numpy() for i, t in enumerate(tgt_tg)},
             ls_total=np.array(ls_out[0].item()),
             ls_parts=np.array([ls_out[1], ls_out[2], ls_out[3], ls_out[4]]),
             probs=probs.numpy(), kld=np.array(kld), lsl=np.array(lsl),
             gce_logits=gce_logits.numpy(), gce_labels=gce_labels.numpy(),
             gce=np.array(gce))
    print("optimizer/loss fixtures written")


if __name__ == "__main__":
    main()
