#!/bin/bash
# Round-15 evidence sequence (consolidation round + q333/q334) —
# strictly serial (SCALING.md contention rule)
set -x
cd /root/repo
date
python tools/correctness_report.py /root/testdata/sf0.1 > /tmp/r15_corr01.log 2>&1
echo "CORR01_EXIT=$?"
date
SPARK_GRAFT_CPUS=7 python tools/correctness_report.py /root/testdata/sf0.1 > /tmp/r15_alt7.log 2>&1
echo "ALT7_EXIT=$?"
date
python tools/latency_sweep.py /root/testdata/sf0.1 /tmp/r15_latency.jsonl > /tmp/r15_lat.log 2>&1
echo "LAT_EXIT=$?"
date
python bench.py > /tmp/r15_bench.log 2>&1
echo "BENCH_EXIT=$?"
date
python -m pytest tests/ -q > /tmp/r15_pytest.log 2>&1
echo "PYTEST_EXIT=$?"
date
python tools/window_replay.py /root/testdata/sf0.01 > /tmp/replay_r15.log 2>&1
echo "REPLAY_EXIT=$?"
date
echo ALL_DONE_R15
