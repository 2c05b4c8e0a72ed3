#!/bin/bash
# Periodic persistence loop for round 4: session restarts and round
# boundaries have repeatedly killed live sweeps and wiped untracked files
# (see CLAUDE.md).  Every INTERVAL seconds, commit whatever artifacts are
# stable: verified checkpoints + resume blobs (scripts/persist_artifacts.py)
# and the CPU arbiter's running history/resume snapshot (gitignored, so
# force-added here).  Idempotent: nothing to commit -> no commit.
cd "$(dirname "$0")/.."
INTERVAL=${1:-2400}
while true; do
  sleep "$INTERVAL"
  echo "=== persist_loop tick $(date -u +%H:%M:%S) ==="
  nice -10 python scripts/persist_artifacts.py --commit \
    --message "Persist trained artifacts (periodic)" || echo "persist FAILED rc=$?"
  for f in ref_vlm_train.npz ref_vlm_resume.pt ref_cdm_train.npz ref_cdm_resume.pt; do
    [ -f "$f" ] && git add -f "$f"
  done
  git diff --cached --quiet || git commit -q -m "Snapshot arbiter curves (periodic)" || true
done
