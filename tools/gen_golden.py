"""Generate golden parity fixtures by running the *reference* implementation.

This tool imports willcai7/Multimodal-GHM from /root/reference (read-only) and
records its numerical outputs — transition matrices, BP posteriors, guided
message stacks — into small .npz fixtures under tests/golden/.  The test
suite then checks that the ghm_tpu array programs reproduce these values,
without any reference code living in this repository.

Run once (or whenever fixtures need regeneration):
    python tools/gen_golden.py
"""

import os
import sys

import numpy as np

REF_SRC = "/root/reference/src"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main():
    sys.path.insert(0, REF_SRC)
    from ghmclip.data.data_random_GHM import GenTransition, GHMTree  # noqa: E501

    os.makedirs(OUT_DIR, exist_ok=True)
    V = 10
    p_y = np.ones(V) / V

    # ------------------------------------------------------------------
    # Fixture 1: transitions (translation-invariant and per-edge modes).
    # ------------------------------------------------------------------
    for ti, tag in [(True, "ti"), (False, "edge")]:
        np.random.seed(42)
        trans = GenTransition(3, 3, V, p_flip=0.12, flip_scale=1.0, translation_invariance=ti)
        flat = {f"layer{l}": np.stack(trans[l]) for l in range(3)}
        np.savez(os.path.join(OUT_DIR, f"transitions_{tag}.npz"), **flat)

    # Shared transitions for the BP fixtures (L=3, C=3, p=0.1).
    np.random.seed(42)
    trans = GenTransition(3, 3, V, p_flip=0.1, flip_scale=1.0, translation_invariance=True)
    trans_arrays = {f"layer{l}": np.stack(trans[l]) for l in range(3)}

    B = 8
    rng = np.random.RandomState(7)
    root = rng.randint(0, V, size=B)
    tree = GHMTree(3, 3, V, p_y, 0.1, trans, batch_size=B, build_tree=True, root=root)
    leaves = np.array(tree.leaves_values).T  # [B, T]

    # ------------------------------------------------------------------
    # Fixture 2: BP_CLS posterior + per-layer hd messages + CLS guides.
    # ------------------------------------------------------------------
    posterior = tree.BP_CLS()  # [V, B]
    h_msgs = {}
    for d in range(3):
        h_msgs[f"h{d}"] = np.stack([node.hd_message for node in tree.Tree[d]])  # [E, V, B]
    guides = tree.guided_info(device="cpu")
    np.savez(
        os.path.join(OUT_DIR, "bp_cls.npz"),
        leaves=leaves,
        root=root,
        posterior=np.array(posterior),
        **h_msgs,
        **{f"guide{i}": g.numpy() for i, g in enumerate(guides)},
        **trans_arrays,
    )

    # ------------------------------------------------------------------
    # Fixture 3: BP_DNS with external root message + DNS guides.
    # ------------------------------------------------------------------
    tree = GHMTree(3, 3, V, p_y, 0.1, trans, batch_size=B, build_tree=True, root=root)
    leaves_d = np.array(tree.leaves_values).T
    sigma = 0.7
    z = rng.randn(27, B) * sigma + tree.leaves_values  # [T, B]
    external = rng.randn(V, B) * 0.5
    external -= external.max(0)
    pm = tree.BP_DNS(z, sigma, external_hd_message=external)  # [T, B]
    guides = tree.guided_info(device="cpu")
    np.savez(
        os.path.join(OUT_DIR, "bp_dns.npz"),
        leaves=leaves_d,
        z=z.T,
        external=external.T,
        sigma=np.array(sigma),
        posterior_mean=np.array(pm).T,
        **{f"guide{i}": g.numpy() for i, g in enumerate(guides)},
        **trans_arrays,
    )

    # ------------------------------------------------------------------
    # Fixture 4: BP_NWP_autoregressive with external message + guides.
    # ------------------------------------------------------------------
    tree = GHMTree(3, 3, V, p_y, 0.1, trans, batch_size=B, build_tree=True, root=root)
    leaves_n = np.array(tree.leaves_values).T
    external = rng.randn(V, B) * 0.5
    external -= external.max(0)
    pp, guides = tree.BP_NWP_autoregressive(
        guide_info=True, device="cpu", external_hd_message=external
    )
    np.savez(
        os.path.join(OUT_DIR, "bp_nwp.npz"),
        leaves=leaves_n,
        external=external.T,
        predict_pp=pp.numpy(),
        **{f"guide{i}": g.numpy() for i, g in enumerate(guides)},
        **trans_arrays,
    )

    # NWP without external message (sequential-VLM raw mode exercises this).
    tree = GHMTree(3, 3, V, p_y, 0.1, trans, batch_size=B, build_tree=True, root=root)
    pp2, _ = tree.BP_NWP_autoregressive(guide_info=False, device="cpu")
    np.savez(
        os.path.join(OUT_DIR, "bp_nwp_noext.npz"),
        leaves=np.array(tree.leaves_values).T,
        predict_pp=pp2.numpy(),
        **trans_arrays,
    )

    print("golden fixtures written to", os.path.abspath(OUT_DIR))
    for f in sorted(os.listdir(OUT_DIR)):
        print(" ", f, os.path.getsize(os.path.join(OUT_DIR, f)), "bytes")


if __name__ == "__main__":
    main()
