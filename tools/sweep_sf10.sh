#!/usr/bin/env bash
# Above-gate (sf10, 100x) sweep orchestration: chunk the ledger's queries
# across N sequential Verify JVMs (shuffle scratch is reclaimed at JVM
# exit — one JVM over 227 queries at 100x exhausts local disk), then run
# the budgeted DuckDB compare. See .claude/skills/verify/SKILL.md.
set -euo pipefail
SF_DIR=${1:-/tmp/graft_sf10}
OUT=${2:-/tmp/verify_sf10}
CHUNKS=${3:-4}
OUT_JSON=${4:-}
BUDGET=${5:-300}
# The REAL default exclusion set, shared verbatim with the compare step
# below so the artifact's named-skip list can never drift from what was
# actually skipped (the r15 judging finding). EMPTY since r17:
# margin_mine_bitext left this list in r16 and margin_mine_ann in r17 —
# both registrations now cap their pools by construction
# (lowest-2000-per-side GlobalLimit), so the fixed-kCells replay runs
# small at any SF and skip_by_design is structurally zero.
SKIP=${SPARK_GRAFT_SKIP:-}
# The default 64g driver heap is required: 8g (the build default) OOMs
# the 100x shuffles. Fail fast when the host can't back it rather than
# dying mid-chunk in JVM startup or swap.
MEM=${SPARK_DRIVER_MEM:-64g}
if [[ "$MEM" =~ ^([0-9]+)g$ ]]; then
  NEED_KB=$(( ${BASH_REMATCH[1]} * 1024 * 1024 ))
  AVAIL_KB=$(awk '/MemAvailable/ {print $2}' /proc/meminfo)
  if (( AVAIL_KB < NEED_KB )); then
    echo "[sweep] ERROR: SPARK_DRIVER_MEM=$MEM but only $((AVAIL_KB/1024/1024)) GiB available;" >&2
    echo "[sweep]        lower SPARK_DRIVER_MEM (sweep needs >=32g realistically) or free memory" >&2
    exit 1
  fi
fi

cd "$(dirname "$0")/.."
grep -oP '(?<=^    ")[a-z0-9_]+(?=",$)' src/main/scala/graft/Queries.scala \
  | sort -u | grep -vxF "$(echo "$SKIP" | tr ',' '\n')" > /tmp/sweep_names.txt
TOTAL=$(wc -l < /tmp/sweep_names.txt)
echo "[sweep] $TOTAL queries, $CHUNKS chunks, skipping: $SKIP"
mkdir -p "$OUT"
PER=$(( (TOTAL + CHUNKS - 1) / CHUNKS ))
for i in $(seq 1 "$CHUNKS"); do
  NAMES=$(sed -n "$(( (i-1)*PER + 1 )),$(( i*PER ))p" /tmp/sweep_names.txt \
    | paste -sd, -)
  [ -z "$NAMES" ] && continue
  echo "[sweep] chunk $i/$CHUNKS: $(echo "$NAMES" | tr ',' '\n' | wc -l) queries"
  # 8g (the build default) OOMs the 100x shuffles — a fresh shell that
  # forgets the heap override must not waste a chunk finding that out
  SPARK_GRAFT_QUERIES="$NAMES" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    SPARK_DRIVER_MEM="$MEM" \
    sbt -batch "runMain graft.Verify $SF_DIR $OUT"
done
echo "[sweep] verify done; dumped $(ls -d "$OUT"/*/ | wc -l) result dirs"
# budgeted DuckDB compare, fed the SAME effective skip list so every
# exclusion lands in the artifact as a named skip_by_design entry and
# the summary reconciles to the full ledger mechanically
if [ -n "$OUT_JSON" ]; then
  SPARK_GRAFT_SKIP="$SKIP" python3 tools/compare_budget.py \
    "$SF_DIR" "$OUT" "$OUT_JSON" "$BUDGET"
fi
