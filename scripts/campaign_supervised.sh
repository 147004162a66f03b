#!/bin/bash
# Supervised campaign: restart on watchdog exit (42 = wedged device
# dispatch, see sp_gan_tpu/utils/watchdog.py). Atomic checkpoints +
# --restore mean a restart loses at most one snapshot interval. Any other
# nonzero exit is a real crash and stops the loop.
#
#   scripts/campaign_supervised.sh --max_epoch 9000 [more campaign.py flags]
set -u
cd "$(dirname "$0")/.."
first=1
while :; do
    if [ "$first" = 1 ]; then
        python scripts/campaign.py "$@"
    else
        python scripts/campaign.py "$@" --restore
    fi
    rc=$?
    if [ "$rc" -ne 42 ]; then
        exit "$rc"
    fi
    echo "[supervisor] watchdog restart (rc=42)" >&2
    first=0
    sleep 30
done
