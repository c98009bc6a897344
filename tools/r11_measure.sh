#!/bin/bash
# Round-11 measurement pipeline — run SEQUENTIALLY on an otherwise-quiet
# box (bench timings are only adjudicable from a quiet box; BASELINE.md).
# Order: correctness insurance sweeps first (contention-tolerant), then
# the timing runs.
set -x
cd /root/repo

# 1. insurance sweeps (dtype-strict is the default since r10)
SPARK_GRAFT_CPUS=16 python tools/selfcheck.py --sf /root/testdata/sf0.01 \
  --default-session > selfcheck_default_r11.txt 2>&1
SPARK_GRAFT_CPUS=16 python tools/selfcheck.py --sf /root/testdata/sf0.01 \
  --conf spark.sql.adaptive.enabled=false > selfcheck_aqe_off_r11.txt 2>&1

# 2. let the box settle
sleep 60

# 3. at-rest index lifecycle, quiet re-run (fresh dirs each time)
python tools/index_lifecycle_scale.py > /tmp/ixscale_quiet.log 2>&1

# 4. three-decade sweep: the two flattened rows + the five never-scaled
#    expensive rows (semantic_dedup now rides the scaled embeddings)
python tools/scaling_sweep.py --out scaling_r11_s2.json \
  --queries "streaming_window_funnel,permutation_test_price,lpa_communities,funnel_conversion,theil_sen_trend,abc_xyz_parts,semantic_dedup" \
  > /tmp/sweep_s2_quiet.log 2>&1

# 5. full quiet bench -> bench_latest.json
python bench.py > /tmp/bench_r11.log 2>&1

echo "R11_MEASURE_DONE"
