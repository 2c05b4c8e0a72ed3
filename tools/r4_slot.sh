#!/bin/bash
# Round-4 claim-slot runner: run a sequence of grid slices in ONE process
# slot (each python process acquires/releases the TPU claim serially, so a
# chain occupies exactly one of the relay's ~5 concurrent claims).
#
# Usage: tools/r4_slot.sh "<grid>:<p_lo>:<p_hi>[:remat]" ...
# Example: tools/r4_slot.sh vlm_jt:0.02:0.20 vlm_st:0.22:0.40
cd "$(dirname "$0")/.."
for spec in "$@"; do
  IFS=: read -r grid lo hi flag <<< "$spec"
  args=("$grid" "--p_list=${lo}:${hi}:0.02")
  [ "$flag" = "remat" ] && args+=("--remat=True")
  echo "=== r4_slot: launching ${args[*]} at $(date -u +%H:%M:%S) ==="
  python tools/run_grid_slice.py "${args[@]}"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== r4_slot: ${args[*]} FAILED rc=$rc; retrying with remat in 90s ==="
    sleep 90
    python tools/run_grid_slice.py "$grid" "--p_list=${lo}:${hi}:0.02" --remat=True
    rc=$?
    [ $rc -ne 0 ] && echo "=== r4_slot: remat retry ALSO FAILED rc=$rc; moving on ==="
  fi
  sleep 5
done
echo "=== r4_slot: chain done at $(date -u +%H:%M:%S) ==="
