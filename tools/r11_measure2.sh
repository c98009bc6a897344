#!/bin/bash
# Round-11 measurement, part 2 (after the semantic_dedup sf10 abort):
# the s2 sweep re-run with the SCALED SemDeDup twin in place of the
# naive entry (whose sf10 point is quadratic-by-spec on fixed cells —
# waived in BASELINE.md with the sf0.1/sf1 evidence), then the full
# quiet bench.
set -x
cd /root/repo
sleep 30
python tools/scaling_sweep.py --out scaling_r11_s2.json \
  --queries "streaming_window_funnel,permutation_test_price,lpa_communities,funnel_conversion,theil_sen_trend,abc_xyz_parts,semantic_dedup_scaled" \
  > /tmp/sweep_s2b.log 2>&1
python bench.py > /tmp/bench_r11.log 2>&1
echo "R11_MEASURE2_DONE"
