#!/bin/bash
# One-command recovery after a session restart.  Three restarts this round
# each cost chip-idle time until the slots were manually relaunched; this
# script is the whole recovery.  Safe to run blindly:
#   * refuses to launch sweeps if any sweep process is already live
#     (duplicate shard training is wasted work — CLAUDE.md round-3 note)
#   * each run_grid_slice self-skips shards whose done-markers exist, so
#     the fixed 5-slot assignment below stays correct as shards finish
#   * watchers and the VLM arbiter are only started if not already running
cd "$(dirname "$0")/.."
mkdir -p logs/r4

# A fresh checkout (round/session boundary) loses the assume-unchanged
# index bits, after which every git command re-hashes ~5 GB of churning
# resume blobs (observed: git commit timing out at 2 min).  Re-set first.
git ls-files logs | grep sweep_resume | xargs -r git update-index --assume-unchanged

if ps aux | grep -e run_grid_slice.py -e r4_slot.sh | grep -v grep >/dev/null; then
  echo "live sweep processes found; refusing to relaunch slots:"
  ps aux | grep -e run_grid_slice.py -e r4_slot.sh | grep -v grep
else
  # 4 chains, not 5: one relay claim stays permanently free so the
  # driver's bench.py (and the vlm_finish eval window) can always claim
  # the chip.  GT is the ~6 h critical path either way, so queueing jt s2
  # behind st s1 costs no completion time.
  setsid nohup tools/r4_slot.sh vlm_gt:0.02:0.20:remat >> logs/r4/slot1.log 2>&1 < /dev/null &
  sleep 4
  setsid nohup tools/r4_slot.sh vlm_gt:0.22:0.40:remat >> logs/r4/slot2.log 2>&1 < /dev/null &
  sleep 4
  setsid nohup tools/r4_slot.sh vlm_jt:0.02:0.20 vlm_st:0.22:0.40 >> logs/r4/slot4.log 2>&1 < /dev/null &
  sleep 4
  setsid nohup tools/r4_slot.sh vlm_st:0.02:0.20 vlm_jt:0.22:0.40 >> logs/r4/slot5.log 2>&1 < /dev/null &
  echo "4 sweep chains launched"
fi

ps aux | grep r4_persist_loop | grep -v grep >/dev/null ||
  setsid nohup tools/r4_persist_loop.sh 2400 >> logs/r4/persist.log 2>&1 < /dev/null &
ps aux | grep r4_vlm_finish | grep -v grep >/dev/null ||
  setsid nohup tools/r4_vlm_finish.sh >> logs/r4/vlm_finish.log 2>&1 < /dev/null &
ps aux | grep train_reference_vlm | grep -v grep >/dev/null ||
  setsid nohup nice -19 python tools/train_reference_vlm.py >> logs/r4/ref_vlm.log 2>&1 < /dev/null &
sleep 2
echo "=== live processes ==="
ps aux | grep -e run_grid_slice -e r4_slot -e r4_persist -e r4_vlm_finish -e train_reference_vlm | grep -v grep
