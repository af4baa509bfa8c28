#!/bin/bash
# Round-14 evidence sequence v9 (after the fifth wave q328-q332) —
# strictly serial (SCALING.md contention rule)
set -x
cd /root/repo
date
python tools/correctness_report.py /root/testdata/sf0.1 > /tmp/r14_corr01_v9.log 2>&1
echo "CORR01_EXIT=$?"
date
SPARK_GRAFT_CPUS=7 python tools/correctness_report.py /root/testdata/sf0.1 > /tmp/r14_alt7_v9.log 2>&1
echo "ALT7_EXIT=$?"
date
python tools/latency_sweep.py /root/testdata/sf0.1 /tmp/r14_latency_v9.jsonl > /tmp/r14_lat_v9.log 2>&1
echo "LAT_EXIT=$?"
date
python bench.py > /tmp/r14_bench_v9.log 2>&1
echo "BENCH_EXIT=$?"
date
python -m pytest tests/ -q > /tmp/r14_pytest_v9.log 2>&1
echo "PYTEST_EXIT=$?"
date
python tools/window_replay.py /root/testdata/sf0.01 > /tmp/replay_r14_v9.log 2>&1
echo "REPLAY_EXIT=$?"
date
echo ALL_DONE_V9
