#!/bin/bash
# Launch (or relaunch) the resident scaling hunter. Safe to re-run:
# kills any previous hunter + held legs first, by pidfile.
cd /root/repo
if [ -f /tmp/hunt.pid ]; then
    kill -9 "$(cat /tmp/hunt.pid)" 2>/dev/null
fi
# stale held coordinator + its legs (they hold idle Ray sessions);
# the pidfile records the coordinator's pid == pgid (new session), so
# a group kill reaps both pre-warmed leg processes too
for p in $(cat /tmp/hunt_children.pid 2>/dev/null); do
    kill -9 -- "-$p" 2>/dev/null || kill -9 "$p" 2>/dev/null
done
sleep 1
HUNT_HOURS="${HUNT_HOURS:-12}" nohup python tools/scaling_hunt.py \
    > /tmp/scaling_hunt_stdout.log 2>&1 &
echo $! > /tmp/hunt.pid
echo "hunter pid $(cat /tmp/hunt.pid)"
