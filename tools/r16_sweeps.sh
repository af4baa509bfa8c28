#!/bin/bash
# Round-16 evidence sequence (SQL-programmability/Arrow/physical/PyDataSource
# wave q337-q350) — strictly serial (SCALING.md contention rule)
set -x
cd /root/repo
date
python tools/correctness_report.py /root/testdata/sf0.1 > /tmp/r16_corr01.log 2>&1
echo "CORR01_EXIT=$?"
date
SPARK_GRAFT_CPUS=7 python tools/correctness_report.py /root/testdata/sf0.1 > /tmp/r16_alt7.log 2>&1
echo "ALT7_EXIT=$?"
date
python tools/latency_sweep.py /root/testdata/sf0.1 /tmp/r16_latency.jsonl > /tmp/r16_lat.log 2>&1
echo "LAT_EXIT=$?"
date
python bench.py > /tmp/r16_bench.log 2>&1
echo "BENCH_EXIT=$?"
date
python -m pytest tests/ -q > /tmp/r16_pytest.log 2>&1
echo "PYTEST_EXIT=$?"
date
python tools/window_replay.py /root/testdata/sf0.01 > /tmp/replay_r16.log 2>&1
echo "REPLAY_EXIT=$?"
date
echo ALL_DONE_R16
