#!/bin/bash
# Serial TPU session: run the round's one-shot chip measurements back to
# back (STRICTLY one TPU process at a time — the axon tunnel wedges under
# concurrent clients). Each step appends to its own log under /tmp.
set -u
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))" | tee -a /tmp/chip_session.log
  "$@" > "/tmp/chip_$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date -u +%H:%M:%S))" | tee -a /tmp/chip_session.log
  tail -5 "/tmp/chip_$name.log" | grep -vE "WARNING|^E08" | tee -a /tmp/chip_session.log
}

case "${1:-all}" in
  ab)
    run firstpass_ab python tools/bench_firstpass_ab.py 16384
    ;;
  aot)
    run export_aot python tools/export_bench_artifacts.py 16384
    run bench python bench.py
    ;;
  gates)
    run bench_gates python tools/bench_gates.py
    ;;
  refine)
    run refine_sweep python tools/bench_refine_sweep.py 4096
    ;;
  all)
    run firstpass_ab python tools/bench_firstpass_ab.py 16384
    run export_aot python tools/export_bench_artifacts.py 16384
    run bench python bench.py
    run bench_gates python tools/bench_gates.py
    run refine_sweep python tools/bench_refine_sweep.py 4096
    ;;
esac
echo "chip session done ($(date -u +%H:%M:%S))" | tee -a /tmp/chip_session.log
