#!/bin/bash
# Round-end checklist in one command (run with ~15 min of round left):
#   1. persist all sweep checkpoints + resume blobs to git
#   2. force-add the gitignored arbiter working state so the next round
#      RESUMES instead of restarting (the omission of this step cost the
#      round-3 CDM arbiter its resume point)
#   3. snapshot the VLM arbiter curve into tools/data/ for the comparison
#      tool's committed fallback
#   4. report how many TPU claims are still held (must be <=4 so the
#      driver's bench.py can claim the chip; kill a gt chain if 5)
set -x
cd "$(dirname "$0")/.."
python scripts/persist_artifacts.py --commit
python - <<'EOF'
import numpy as np, os, shutil
src = "/root/repo/ref_vlm_train.npz"
if os.path.exists(src):
    d = np.load(src)
    print("ref_vlm_train.npz upto:", int(d["upto"]) if "upto" in d else "?")
    shutil.copy(src, "/root/repo/tools/data/ref_vlm_curve.npz")
EOF
git add -f ref_vlm_train.npz ref_vlm_resume.pt tools/data/ref_vlm_curve.npz 2>/dev/null
git add -f ref_cdm_train.npz ref_cdm_resume.pt 2>/dev/null
git commit -q -m "Snapshot arbiter curves + resume state for next-round continuation" || true
echo "=== TPU claim holders ==="
ps aux | grep -e run_grid_slice -e run_evals -e r4_slot | grep -v grep
