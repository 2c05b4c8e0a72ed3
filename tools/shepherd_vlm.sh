#!/bin/bash
# Shepherd one remaining VLM grid shard: wait for a named pid to exit
# (freeing a TPU-relay claim slot), wait out the claim-release grace period,
# then run the shard to completion in this process.
#
# The TPU relay grants roughly five concurrent claims; a sixth process
# queues indefinitely (round 3 measured a 27-minute wedge).  Launch chains
# with:
#   setsid nohup bash tools/shepherd_vlm.sh <pid-to-wait-for> <grid> \
#       <p_list> [extra flags...] >> log 2>&1 < /dev/null &
# e.g.
#   bash tools/shepherd_vlm.sh 1304 vlm_st 0.22:0.40:0.02
#   bash tools/shepherd_vlm.sh 14717 vlm_gt 0.22:0.40:0.02 --remat=True
#
# Before launching ANY new sweep, `ps aux | grep -e run_grid_slice -e shepherd`
# (duplicate mid-flight shard training is the known operator hazard).
set -u
WAIT_PID="$1"; GRID="$2"; PLIST="$3"; shift 3
cd "$(dirname "$0")/.."

ID_WAIT="$(ps -p "${WAIT_PID}" -o args= 2>/dev/null || true)"
echo "shepherd: waiting for pid ${WAIT_PID} (${ID_WAIT}) to exit before ${GRID} ${PLIST}"
while kill -0 "${WAIT_PID}" 2>/dev/null; do
  # guard against pid recycling: stop waiting if the pid's identity changed
  CUR="$(ps -p "${WAIT_PID}" -o args= 2>/dev/null || true)"
  [ "${CUR}" = "${ID_WAIT}" ] || break
  sleep 60
done
echo "shepherd: pid ${WAIT_PID} gone; sleeping 90s for claim release"
sleep 90
exec python tools/run_grid_slice.py "${GRID}" "--p_list=${PLIST}" "$@"
