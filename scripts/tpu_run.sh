#!/bin/bash
# Run a TPU job with an axon first-touch-hang watchdog: if the job's
# python process accumulates <5s of CPU over each 150s window (hung
# futex-wait handshake, see .claude/skills/verify/SKILL.md gotchas),
# kill it and retry (3x). Healthy jobs burn CPU continuously (imports,
# tracing, XLA compile, host-driven dispatch loops).
# Usage: tpu_run.sh <logfile> <cmd...>
log="$1"; shift

cputime() {
    # total CPU jiffies of pid $1 AND its direct children (the command is
    # usually `timeout ... python ...`: the wrapper itself burns ~0 CPU)
    local total=0 p
    for p in $1 $(pgrep -P "$1" 2>/dev/null); do
        local j
        j=$(awk '{print $14+$15}' /proc/$p/stat 2>/dev/null) || continue
        total=$((total + ${j:-0}))
        local q
        for q in $(pgrep -P "$p" 2>/dev/null); do
            j=$(awk '{print $14+$15}' /proc/$q/stat 2>/dev/null) || continue
            total=$((total + ${j:-0}))
        done
    done
    echo $total
}

for attempt in 1 2 3; do
    if [ "$attempt" = 1 ]; then : > "$log"; fi   # append on retries
    "$@" >> "$log" 2>&1 &
    pid=$!
    last=0
    hung=0
    while kill -0 $pid 2>/dev/null; do
        sleep 240
        kill -0 $pid 2>/dev/null || break
        c=$(cputime $pid)
        if [ $((c - last)) -lt 500 ]; then   # <5s CPU over the window
            # (240s window: the axon first-touch futex hang usually
            # self-resolves in ~4-6 min — killing at 150s thrashes)
            echo "tpu_run: attempt $attempt stalled (jiffies $last -> $c), retrying" >> "$log"
            kill $pid 2>/dev/null; sleep 3
            kill -9 $pid $(pgrep -P "$pid" 2>/dev/null) 2>/dev/null
            sleep 5
            hung=1
            break
        fi
        last=$c
    done
    if [ "$hung" = 0 ]; then
        wait $pid
        exit $?
    fi
done
echo "tpu_run: giving up after 3 stalled attempts" >> "$log"
exit 1
