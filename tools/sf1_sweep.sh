#!/bin/sh
# Full-registry sf1 oracle sweep, partitioned into four targeted
# drive_driver passes (r11). One alphabetical sweep stalls on the
# dedup block's multi-minute queries while cheap queries wait behind
# them; running the blocks separately keeps each log short-lived and
# makes partial progress durable. Generate fixtures first:
#   python tools/gen_fixtures.py --sf 1.0 --out /root/repo/.sf1
# Total ~90 min at 32 CPUs (bulk ~25, streaming ~7, mm/sim ~6,
# dedup ~50 — the O(n²) embedding baseline and its 200M-pair
# theta-join oracle dominate the last block by design).
set -e
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/repo/.sf1}
export SPARK_GRAFT_DRIVER_MEM=${SPARK_GRAFT_DRIVER_MEM:-8g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}

BULK=$(python - <<'EOF'
import __spark_entry__ as e
print(" ".join(q for q in sorted(e.queries())
               if not q.startswith(("dedup_", "similarity_",
                                    "stream_", "multimodal_"))))
EOF
)
STREAM=$(python - <<'EOF'
import __spark_entry__ as e
print(" ".join(q for q in sorted(e.queries()) if q.startswith("stream_")))
EOF
)
MMSIM=$(python - <<'EOF'
import __spark_entry__ as e
print(" ".join(q for q in sorted(e.queries())
               if q.startswith(("multimodal_", "similarity_"))))
EOF
)
DEDUP=$(python - <<'EOF'
import __spark_entry__ as e
print(" ".join(q for q in sorted(e.queries()) if q.startswith("dedup_")))
EOF
)

for block in "$BULK" "$STREAM" "$MMSIM" "$DEDUP"; do
    python tools/drive_driver.py $block
done
echo "sf1 sweep: all four blocks passed"
