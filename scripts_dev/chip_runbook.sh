#!/bin/bash
# On-chip measurement sequence for when the axon tunnel returns (r3).
# Order: canonical bench FIRST (headline safety; zigzag graph changed this
# session -> cold compile through the relay), then microbench + profile for
# the tuning loop. Each stage logs under /tmp/chip_r3_*.log.
set -x
cd /root/repo
timeout 5400 python bench.py > /tmp/chip_r3_bench.log 2>&1
echo "bench rc=$?"
tail -3 /tmp/chip_r3_bench.log
timeout 3600 python scripts_dev/attn_microbench.py > /tmp/chip_r3_attn.log 2>&1
echo "attn rc=$?"
timeout 3600 python scripts_dev/profile_fwd.py > /tmp/chip_r3_prof.log 2>&1
echo "prof rc=$?"
