"""Render all paper figures from the ghm-data JSONs.

Script counterpart of the reference's five plotting notebooks
(``Fig2-taskRisks.ipynb``, ``Fig56-ZSC-m.ipynb``, ``Fig7-imagenet.ipynb``,
``Fig8-OODRisks.ipynb``, ``Fig9-OODrisks2.ipynb``): each risk panel plots the
model risk curves against the exact Bayes baseline with the excess risk
(model − Bayes) on a twin axis; Fig. 5/6 plot ZSC risk versus support size M
with ``A/M + B`` fits; Fig. 7 (real-data ImageNet curves from the external
14.9 GiB similarity tensor) is rendered only when that tensor is present.

Usage: python figures/plot_figures.py [--only fig2,fig5,fig6,fig7,fig8,fig9]
Outputs PDFs under figures/output/ with the canonical reference filenames.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ghm_tpu.eval.paths import GHM_DATA_DIR, REPO_ROOT  # noqa: E402

OUT_DIR = REPO_ROOT / "figures" / "output"
MODEL_KEYS = ["Standard TF", "Guided TF", "Shallow TF", "Joint Training"]
COLORS = {"Standard TF": "tab:blue", "Guided TF": "tab:orange",
          "Shallow TF": "tab:green", "Joint Training": "tab:red",
          "Bayes": "black", "Mis-spec. BP": "tab:gray"}


def _load(name):
    path = GHM_DATA_DIR / name
    if not path.exists():
        print(f"  [skip] missing {path}")
        return None
    with open(path) as f:
        return json.load(f)


def _risk_panel(data, title, ylabel, out_name, x_key="p_flip",
                xlabel="$p$ (%)"):
    fig, ax = plt.subplots(figsize=(4.2, 3.4))
    ax2 = ax.twinx()
    x = np.asarray(data[x_key])
    bayes = np.asarray(data["Bayes"])
    for key in ["Bayes", "Mis-spec. BP", *MODEL_KEYS]:
        if key not in data:
            continue
        y = np.asarray(data[key])
        ax.plot(x, y, label=key, color=COLORS.get(key),
                lw=1.6 if key == "Bayes" else 1.2,
                ls="--" if key == "Mis-spec. BP" else "-")
        if key not in ("Bayes",):
            ax2.plot(x, y - bayes, color=COLORS.get(key), alpha=0.25, ls=":")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax2.set_ylabel("excess risk")
    ax.set_title(title)
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(OUT_DIR / out_name)
    plt.close(fig)
    print(f"  wrote {OUT_DIR / out_name}")


def fig2():
    specs = [
        ("clip-risk.json", "CLIP pretraining", "contrastive risk", "Fig2-a-CLIP-risk.pdf"),
        ("zsc-risk.json", "Zero-shot classification", "cross entropy", "Fig2-b-ZSC-risk.pdf"),
        ("cdm-risk.json", "Conditional denoising", "MSE", "Fig2-c-CDM-risk.pdf"),
        ("vlm-risk.json", "Next-word prediction", "cross entropy", "Fig2-d-VLM-risk.pdf"),
    ]
    for name, title, ylabel, out in specs:
        data = _load(name)
        if data:
            _risk_panel(data, title, ylabel, out)


def fig56():
    data = _load("zsc-numsamples.json")
    if not data:
        return
    m = np.asarray(data["num_samples_list"], dtype=float)
    fig, ax = plt.subplots(figsize=(4.2, 3.4))
    for key in ["Bayes", "Standard TF", "Guided TF", "Shallow TF"]:
        if key in data:
            y = np.asarray(data[key])
            if y.size == 1:
                y = np.full_like(m, y[0])
            ax.plot(m, y, label=key, color=COLORS.get(key))
    ax.set_xlabel("number of text samples $M$")
    ax.set_ylabel("zero-shot cross entropy")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(OUT_DIR / "Fig5-ZSC-vs-M.pdf")
    plt.close(fig)
    print(f"  wrote {OUT_DIR / 'Fig5-ZSC-vs-M.pdf'}")

    # Fig 6: A/M + B fits per variant (reference Fig56-ZSC-m.ipynb cell 5).
    for letter, key in zip("abc", ["Standard TF", "Guided TF", "Shallow TF"]):
        if key not in data:
            continue
        y = np.asarray(data[key])
        if y.size != m.size:
            continue
        A, B = np.polyfit(1.0 / m, y, 1)
        fig, ax = plt.subplots(figsize=(4.2, 3.4))
        ax.plot(m, y, ".", ms=3, label=key, color=COLORS.get(key))
        ax.plot(m, A / m + B, "-", color="black",
                label=f"fit ${A:.2f}/M + {B:.3f}$")
        ax.set_xlabel("$M$")
        ax.set_ylabel("zero-shot cross entropy")
        ax.legend(fontsize=7)
        fig.tight_layout()
        out = OUT_DIR / f"Fig6-{letter}-ZSC-Fit-{key}.pdf"
        fig.savefig(out)
        plt.close(fig)
        print(f"  wrote {out}")


def fig8():
    specs = [
        ("clip-ood.json", "CLIP OOD", "contrastive risk", "Fig8-a-CLIP-ood.pdf"),
        ("zsc-ood.json", "ZSC OOD", "cross entropy", "Fig8-b-ZSC-ood.pdf"),
        ("cdm-ood.json", "CDM OOD", "MSE", "Fig8-c-CDM-ood.pdf"),
        ("vlm-ood.json", "VLM OOD", "cross entropy", "Fig8-d-VLM-ood.pdf"),
    ]
    for name, title, ylabel, out in specs:
        data = _load(name)
        if data:
            _risk_panel(data, title, ylabel, out, xlabel="test $p$ (%)")


def fig9():
    specs = [
        ("cdm-ood-pt20.json", "CDM OOD ($p_t$=0.20)", "MSE", "Fig9-a-CDM-ood.pdf"),
        ("vlm-ood-pi20.json", "VLM OOD ($p_i$=0.20)", "cross entropy", "Fig9-b-VLM-ood.pdf"),
    ]
    for name, title, ylabel, out in specs:
        data = _load(name)
        if data:
            _risk_panel(data, title, ylabel, out, xlabel="test $p$ (%)")


def fig7():
    """ImageNet prompt-scaling curves from the external similarity tensor.

    Reference ``Fig7-imagenet.ipynb``: loads the precomputed OpenCLIP RN50
    similarities (gated HF dataset, 14.9 GiB), computes zero-shot loss/top-1/
    top-5 versus the number of prompt templates over 32 permutations, and
    fits ``a + b/x``.
    """
    tensor_path = REPO_ROOT / "figures" / "data" / "imagenet-data" / "similarities_targets.pt"
    if not tensor_path.exists():
        print(f"  [skip] Fig7 requires {tensor_path} "
              "(run scripts/download_data.py first)")
        return
    import torch

    blob = torch.load(str(tensor_path), map_location="cpu", mmap=True,
                      weights_only=False)
    sims, targets = blob["similarities"], blob["targets"]
    xs = np.asarray(blob["num_templates_list"], dtype=np.int64)
    n_total = sims.shape[1]
    n_resamples, batch = 32, 1024
    rng = np.random.default_rng(0)
    metrics = {"loss": np.zeros(len(xs)), "acc1": np.zeros(len(xs)),
               "acc5": np.zeros(len(xs))}
    with torch.inference_mode():
        for _ in range(n_resamples):
            perm = torch.as_tensor(rng.permutation(n_total))
            loss_s = np.zeros(len(xs))
            a1_s = np.zeros(len(xs))
            a5_s = np.zeros(len(xs))
            for start in range(0, targets.numel(), batch):
                sl = slice(start, start + batch)
                s = sims[sl][:, perm, :].float()
                t = targets[sl]
                cums = torch.cumsum(s, dim=1)
                for j, n in enumerate(xs):
                    logits = cums[:, n - 1, :] / n
                    loss_s[j] += torch.nn.functional.cross_entropy(
                        logits, t, reduction="sum").item()
                    top5 = logits.topk(5, dim=1).indices
                    a1_s[j] += (top5[:, 0] == t).sum().item()
                    a5_s[j] += (top5 == t[:, None]).any(dim=1).sum().item()
            n_samples = targets.numel()
            metrics["loss"] += loss_s / n_samples / n_resamples
            metrics["acc1"] += a1_s / n_samples / n_resamples
            metrics["acc5"] += a5_s / n_samples / n_resamples
    for letter, (key, ylabel) in zip("abc", [("loss", "loss"),
                                             ("acc1", "top-1 accuracy"),
                                             ("acc5", "top-5 accuracy")]):
        y = np.asarray(metrics[key])
        b, a = np.polyfit(1.0 / xs, y, 1)
        fig, ax = plt.subplots(figsize=(4.2, 3.4))
        ax.plot(xs, y, ".", ms=3)
        ax.plot(xs, a + b / xs, "-", color="black",
                label=f"fit ${a:.3f} + {b:.3f}/x$")
        ax.set_xlabel("number of prompt templates")
        ax.set_ylabel(ylabel)
        ax.legend(fontsize=7)
        fig.tight_layout()
        out = OUT_DIR / f"Fig7-{letter}-imagenet-{'loss' if key == 'loss' else key}.pdf"
        fig.savefig(out)
        plt.close(fig)
        print(f"  wrote {out}")


FIGS = {"fig2": fig2, "fig5": fig56, "fig6": fig56, "fig7": fig7,
        "fig8": fig8, "fig9": fig9}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--only", default=None,
                        help="comma-separated subset, e.g. fig2,fig8")
    args = parser.parse_args()
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    wanted = args.only.split(",") if args.only else ["fig2", "fig5", "fig7",
                                                     "fig8", "fig9"]
    done = set()
    for name in wanted:
        fn = FIGS[name]
        if fn in done:
            continue
        done.add(fn)
        print(f"[{name}]")
        fn()


if __name__ == "__main__":
    main()
