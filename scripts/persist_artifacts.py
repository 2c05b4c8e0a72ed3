"""Persist trained artifacts across round boundaries by committing them.

``logs/`` is gitignored (live checkpoint writes can race ``git add``), but the
workspace is re-created from git between build rounds: anything not committed
is LOST (round 1's trained suite vanished this way and the CLIP grids had to
be retrained).  This tool force-adds the *stable* artifacts — checkpoints that
verify as loadable and resume blobs (written atomically via ``os.replace``) —
so the next round resumes instead of retraining.

Usage:
    python scripts/persist_artifacts.py           # stage verified artifacts
    python scripts/persist_artifacts.py --commit  # stage + commit

Run it whenever a grid finishes, and always at end of round (ideally with
trainers stopped so every final checkpoint is stable).
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
os.chdir(REPO)

# A checkpoint younger than this may still be mid-write (torch.save is
# followed by os.replace since round 2, but trainers launched before that fix
# can still write in place).
STABLE_AGE_S = 120


def loadable(path):
    import torch

    try:
        torch.load(path, map_location="cpu", weights_only=False)
        return True
    except Exception as exc:
        print(f"  SKIP (unloadable): {path}: {type(exc).__name__}: {exc}")
        return False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--commit", action="store_true")
    parser.add_argument("--message", default="Persist trained artifacts")
    parser.add_argument("--no-verify-load", action="store_true",
                        help="skip torch.load verification (faster)")
    args = parser.parse_args()

    now = time.time()
    to_add = []
    for root, _dirs, files in os.walk("logs"):
        for fname in files:
            path = os.path.join(root, fname)
            keep = (
                fname == "checkpoint.pth"
                or (os.path.basename(root) == ".sweep_resume"
                    and fname.endswith(".pkl"))
                or fname in ("config.log", "training.log")
            )
            if not keep:
                continue
            # Resume blobs are published atomically (tmp + os.replace), so a
            # snapshot is always consistent; .pth files written by trainers
            # launched before the atomic-write fix need the stability window.
            atomic = fname.endswith(".pkl")
            if not atomic and now - os.path.getmtime(path) < STABLE_AGE_S:
                print(f"  SKIP (recently written): {path}")
                continue
            if (fname == "checkpoint.pth" and not args.no_verify_load
                    and not loadable(path)):
                continue
            to_add.append(path)

    # A done-marker blob must never be committed without the checkpoints it
    # points at: round 4 committed ShT shard-2's marker while its ten
    # checkpoint.pth (written the same moment the grid finished) were still
    # inside the STABLE_AGE_S window and got skipped — the session then died
    # and the checkpoints were lost, leaving a marker that made every resume
    # path self-skip a shard with no outputs.  Hold such markers back; the
    # next persist run (after the window passes) stages marker + checkpoints
    # together.
    tracked = set(subprocess.run(
        ["git", "ls-files", "logs"], capture_output=True,
        text=True).stdout.splitlines())
    staged_set = set(to_add)

    def _marker_complete(path):
        import pickle

        try:
            with open(path, "rb") as fh:
                blob = pickle.load(fh)
        except Exception:
            return True  # not a marker; full blobs are self-contained
        if not (isinstance(blob, dict) and blob.get("done")):
            return True
        for rd in blob.get("run_dirs", []):
            ckpt = os.path.normpath(os.path.join(rd, "checkpoint.pth"))
            if ckpt not in staged_set and ckpt not in tracked:
                print(f"  HOLD BACK done-marker {path}: {ckpt} neither "
                      "staged nor tracked (re-run persist in ~2 min)")
                return False
        return True

    to_add = [p for p in to_add
              if not (p.endswith(".pkl") and os.path.getsize(p) < 65536)
              or _marker_complete(p)]

    if not to_add:
        print("nothing to persist")
        return
    total = sum(os.path.getsize(p) for p in to_add) / 1e6
    print(f"staging {len(to_add)} files ({total:.0f} MB)")
    # Live sweeps rewrite tracked multi-hundred-MB resume blobs every eval
    # interval; without the assume-unchanged bit every git command between
    # persists re-hashes gigabytes (minutes on this 1-core host).  Clear the
    # bit for staging, re-set it afterwards for the blobs that keep churning.
    blobs = [p for p in to_add if p.endswith(".pkl")]

    def _assume(flag, paths):
        for i in range(0, len(paths), 100):
            subprocess.run(["git", "update-index", flag, "--",
                            *paths[i:i + 100]],
                           stderr=subprocess.DEVNULL)

    _assume("--no-assume-unchanged", blobs)
    # Batched to keep the command line bounded.
    for i in range(0, len(to_add), 100):
        subprocess.run(["git", "add", "-f", "--", *to_add[i:i + 100]],
                       check=True)
    if args.commit:
        staged = subprocess.run(["git", "diff", "--cached", "--quiet"])
        if staged.returncode == 0:
            print("nothing newly staged; no commit")
        else:
            subprocess.run(["git", "commit", "-m", args.message], check=True)
    _assume("--assume-unchanged", blobs)


if __name__ == "__main__":
    sys.exit(main())
