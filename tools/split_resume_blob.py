"""Split a sweep resume blob into two independent slice blobs.

Why: a 10-model shard program steps much slower than a 5-model one on this
remote-TPU setup (remat recompute dominates; measured 20-model cdm_jt at
634 ms/iter vs 142 ms/iter per 10-model shard), while CONCURRENT sweep
processes scale near-linearly (CLAUDE.md).  Splitting a long-running shard's
resume blob into two half-shard blobs lets two `tools/run_grid_slice.py`
processes continue the same training from the same iteration, roughly
halving remaining wall-clock for that shard.

The blob layout (ghm_tpu/parallel/sweep.py `save_resume`):
    n_models, total, iter, run_dirs (list[str]),
    params / opt_state  (pytrees; array leaves stacked on axis 0 of size N,
                         EXCEPT the shared scalar AdamW step counter),
    loss_hist / ploss_hist / compare_hist  ([N, total] numpy).

Child blob names are derived from the parent's tag and the per-model p
values parsed from the run_dirs' tree-folder names, matching exactly the
resume path `ghm_tpu/train/sweep.py:_run_one` computes for a
`--p_list=<lo>:<hi>:0.02` slice invocation — so the slice processes pick
the children up with no extra flags.

Usage:
    python tools/split_resume_blob.py logs/VLM/.sweep_resume/nwp_GT_L9H4D256_p2-20_T30000.pkl
        [--k 5] [--dry-run]
"""

import argparse
import os
import pickle
import re
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def _slice_tree(tree, lo, hi, n):
    """Slice every array leaf with leading axis == n; keep scalars intact."""
    import jax

    def f(x):
        if hasattr(x, "ndim") and x.ndim > 0 and x.shape[0] == n:
            return np.asarray(x[lo:hi])
        return x

    return jax.tree_util.tree_map(f, tree)


def _p_int(run_dir):
    # tree folder like  K4_L4C3p12_L4C3p12sc10  →  12
    m = re.search(r"p(\d+)_", run_dir)
    if not m:
        raise ValueError(f"cannot parse p from run_dir {run_dir!r}")
    return int(m.group(1))


def split_blob(parent_path, k=None, dry_run=False):
    with open(parent_path, "rb") as f:
        blob = pickle.load(f)
    if blob.get("done"):
        raise SystemExit(f"{parent_path} is a done-marker; nothing to split")
    n = int(blob["n_models"])
    k = k or n // 2
    assert 0 < k < n, (k, n)

    name = os.path.basename(parent_path)
    m = re.match(r"^(.*_p)(\d+)-(\d+)(_T\d+\.pkl)$", name)
    if not m:
        raise SystemExit(f"unrecognized blob name {name!r}")
    prefix, suffix = m.group(1), m.group(4)
    p_ints = [_p_int(d) for d in blob["run_dirs"]]

    children = []
    for lo, hi in ((0, k), (k, n)):
        child = {
            "n_models": hi - lo,
            "total": blob["total"],
            "iter": blob["iter"],
            "run_dirs": list(blob["run_dirs"][lo:hi]),
            "params": _slice_tree(blob["params"], lo, hi, n),
            "opt_state": _slice_tree(blob["opt_state"], lo, hi, n),
            "loss_hist": np.asarray(blob["loss_hist"][lo:hi]),
            "ploss_hist": np.asarray(blob["ploss_hist"][lo:hi]),
            "has_compare": bool(blob.get("has_compare")),
        }
        if blob.get("has_compare"):
            child["compare_hist"] = np.asarray(blob["compare_hist"][lo:hi])
        tag = f"{prefix}{p_ints[lo]}-{p_ints[hi - 1]}{suffix}"
        child_path = os.path.join(os.path.dirname(parent_path), tag)
        children.append((child_path, child, (lo, hi)))

    # verify: children partition the parent exactly
    import jax

    for child_path, child, (lo, hi) in children:
        for key in ("params", "opt_state"):
            pl = jax.tree_util.tree_leaves(blob[key])
            cl = jax.tree_util.tree_leaves(child[key])
            assert len(pl) == len(cl)
            for a, b in zip(pl, cl):
                if hasattr(a, "ndim") and a.ndim > 0 and a.shape[0] == n:
                    assert np.array_equal(np.asarray(a[lo:hi]), b)
                else:
                    assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.array_equal(blob["loss_hist"][lo:hi], child["loss_hist"])
        print(f"  {os.path.basename(child_path)}: models {lo}:{hi} "
              f"(p={p_ints[lo]}..{p_ints[hi-1]}), iter {child['iter']}"
              f"/{child['total']}, verified")
        if not dry_run:
            if os.path.exists(child_path):
                raise SystemExit(f"refusing to overwrite {child_path}")
            tmp = f"{child_path}.{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                pickle.dump(child, f, protocol=4)
            os.replace(tmp, child_path)
    return [c[0] for c in children]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("parent")
    ap.add_argument("--k", type=int, default=None,
                    help="models in the first child (default n//2)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    paths = split_blob(args.parent, args.k, args.dry_run)
    print("children:" + ("  (dry run, not written)" if args.dry_run else ""))
    for p in paths:
        print(" ", p)


if __name__ == "__main__":
    main()
