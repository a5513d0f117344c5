#!/bin/bash
# Hero-lane bench (round-17 verdict item 1): the most expensive queries
# at the scaled sf1 lane, same Bench harness / JSON contract, subset via
# GRAFT_BENCH_QUERIES, round-numbered detail writes suppressed
# (GRAFT_BENCH_ROUND=0) and the detail file copied to a named artifact.
# Usage: tools/hero_bench.sh <sfDir> <cpus> <outSuffix>
set -e
SF=${1:-/root/herodata/sf1}
CPUS=${2:-32}
OUT=${3:-hero}
HERO_QUERIES="q82_phase_stats,q62_full_assembly,q187_scc,q335_stream_containment,q132_lsh_eval,q57_dedup_families,q281_decremental_cc,q198_dpp_scan,q333_read_asof,q144_wcc,q197_family_split,q204_family_split_persisted,q201_bpe_train,q209_learned_units,q330_opq_ablation,q332_containment_delta"
cd "$(dirname "$0")/.."
GRAFT_BENCH_ROUND=0 GRAFT_BENCH_QUERIES="$HERO_QUERIES" \
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  sbt "runMain graft.Bench" 2>&1 | tail -5
cp BENCH_DETAIL.json "BENCH_DETAIL_r18_${OUT}.json"
echo "wrote BENCH_DETAIL_r18_${OUT}.json"
