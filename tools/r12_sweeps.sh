#!/bin/bash
# Round-12 evidence sequence — strictly serial (SCALING.md contention rule)
set -x
cd /root/repo
date
python -m pytest tests/ -x -q > /tmp/r12_pytest.log 2>&1
echo "PYTEST_EXIT=$?" | tee -a /tmp/r12_pytest.log
date
python tools/correctness_report.py /root/testdata/sf0.01 > /tmp/r12_corr001.log 2>&1
echo "CORR001_EXIT=$?"
date
python tools/correctness_report.py /root/testdata/sf0.1 > /tmp/r12_corr01.log 2>&1
echo "CORR01_EXIT=$?"
date
SPARK_GRAFT_CPUS=7 python tools/correctness_report.py /root/testdata/sf0.1 > /tmp/r12_alt7.log 2>&1
echo "ALT7_EXIT=$?"
date
python tools/latency_sweep.py /root/testdata/sf0.1 /tmp/r12_latency.jsonl > /tmp/r12_lat.log 2>&1
echo "LAT_EXIT=$?"
date
python bench.py > /tmp/r12_bench.log 2>&1
echo "BENCH_EXIT=$?"
date
echo ALL_DONE
