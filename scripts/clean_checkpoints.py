"""Strip unpicklable keys from legacy checkpoint files.

Counterpart of reference ``scripts/clean_checkpoints.py``: some upstream
checkpoints pickled the live ``loss`` module object, which fails to unpickle
outside the original environment.  This tool rewrites such ``.pth`` files
without the offending top-level keys, keeping a ``.bak`` backup.

ghm_tpu-written checkpoints never include live objects, so this tool only
matters for imported upstream artifacts.

Usage:
    python scripts/clean_checkpoints.py [root=checkpoints] [--keys loss]
                                        [--no-backup] [--dry-run]
"""

import argparse
import os
import shutil
import sys


def clean_file(path, keys, backup=True, dry_run=False):
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except Exception as exc:
        print(f"  UNREADABLE {path}: {exc}")
        return False
    drop = [k for k in keys if k in ckpt]
    if not drop:
        return False
    if dry_run:
        print(f"  would drop {drop} from {path}")
        return True
    if backup:
        shutil.copy2(path, path + ".bak")
    for k in drop:
        del ckpt[k]
    torch.save(ckpt, path)
    print(f"  dropped {drop} from {path}")
    return True


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root", nargs="?", default="checkpoints")
    parser.add_argument("--keys", default="loss",
                        help="comma-separated top-level keys to drop")
    parser.add_argument("--no-backup", action="store_true")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()
    keys = args.keys.split(",")
    n = 0
    for dirpath, _, files in os.walk(args.root):
        for f in files:
            if f.endswith(".pth"):
                n += clean_file(os.path.join(dirpath, f), keys,
                                backup=not args.no_backup,
                                dry_run=args.dry_run)
    print(f"cleaned {n} checkpoint files under {args.root}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
