#!/bin/bash
# One-shot TPU measurement sweep for a round: runs every driver/bench tool
# and leaves the committed artifacts refreshed. Each step is independently
# timed out; failures don't abort the rest (artifacts record what ran).
set -x
cd "$(dirname "$0")/.."

run() { name=$1; shift; timeout "$@" 2>&1 | tail -40 > "/tmp/runbook_$name.log"; echo "== $name rc=$?"; }

run bench        3600 python bench.py
run roofline     3600 python tools/roofline_achieved.py --json roofline_achieved.json
run pallas       3600 python tools/bench_pallas.py
run bigmesh      5400 python tools/bench_bigmesh.py --tris 1000000
run crossover    5400 python tools/sweep_crossover.py --shape blob --json sweep_crossover.json
run tileorder    3600 python tools/probe_tile_order.py
run detail       7200 python tools/bench_detail.py
echo "runbook done"
