#!/bin/bash
# Round-close bench recording + coverage GATE (round-11 verdict item 1).
#
# Round 11 shipped no builder-side full-bench artifact while its notes
# claimed one existed — the third form of end-of-round drift in three
# rounds. This script turns the checklist rule into an assertion:
#  1. records the FULL per-query bench (every SparkEntry.queries key,
#     3 interleaved runs, probe bracket — graft.Bench's standard output)
#     to BENCH_full_r<N>.json, and
#  2. FAILS unless the artifact covers the live query surface exactly
#     (queries ∪ errors == graft.QueryNames), so a truncated recording
#     or a post-notes query can never ship silently again.
#
# usage: scripts/round_close.sh <round>       # e.g. scripts/round_close.sh 12
set -e
cd "$(dirname "$0")/.."
N=${1:?usage: round_close.sh <round number>}
# a leftover local-iteration filter must never shape a round recording:
# SPARK_GRAFT_STREAM_ONLY silently drops sinks from BENCH_streaming.json
# (the liveness gate only iterates sinks PRESENT in the file), and
# SPARK_GRAFT_BENCH_ONLY would truncate the full bench (that one the
# coverage gate catches — unset it anyway so the run isn't wasted)
unset SPARK_GRAFT_STREAM_ONLY SPARK_GRAFT_BENCH_ONLY
OUT="BENCH_full_r${N}.json"
sbt -batch compile >/dev/null 2>&1
echo "[round_close] recording full bench to $OUT (every query, 3 runs + probe)"
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  scripts/run_verify.sh graft.Bench 2>/dev/null | tail -1 > "$OUT"
scripts/run_verify.sh graft.QueryNames 2>/dev/null > /tmp/graft_query_names.txt
python3 - "$OUT" /tmp/graft_query_names.txt <<'EOF'
import json, sys
bench = json.load(open(sys.argv[1]))
covered = set(bench.get("queries", {})) | set(bench.get("errors", {}))
live = set(l.strip() for l in open(sys.argv[2]) if l.strip())
missing = sorted(live - covered)
extra = sorted(covered - live)
if missing or extra:
    print(f"[round_close] COVERAGE GATE FAILED: missing={missing} extra={extra}")
    sys.exit(1)
errs = bench.get("errors", {})
# walk-family budget gate (round-14: the compute-once corpus publish took
# the family from 39.9 s to ~3 s; this asserts the drop never silently
# regresses — a consumer that re-grows the walk generation shows up here,
# probe-normalized so a slow box can't fake a failure). 6x probe ≈ 3x the
# round-14 recording's headroom; the round-13 regeneration shape was ~25x.
walk = ["graph_random_walks", "graph_walk_context_pairs",
        "graph_node2vec_walks", "graph_node2vec_context_pairs"]
probe = bench.get("probe", {}).get("median")
# a renamed/dropped walk query or a missing probe must FAIL the gate, not
# silently disable it (round-14 advice: .get(q, 0.0) and `if probe:` were
# both silent-pass paths in a safety gate)
if not probe:
    print("[round_close] WALK-FAMILY GATE FAILED: probe median missing/zero "
          "— cannot normalize; re-record with graft.Bench's probe bracket")
    sys.exit(1)
absent = [q for q in walk if q not in bench["queries"]]
if absent:
    print(f"[round_close] WALK-FAMILY GATE FAILED: {absent} absent from the "
          "recording — update the gate's query list if they were renamed")
    sys.exit(1)
fam = sum(bench["queries"][q] for q in walk)
if fam > 6 * probe:
    print(f"[round_close] WALK-FAMILY GATE FAILED: {fam:.1f}s > 6x probe "
          f"({probe:.2f}s) — a consumer is regenerating the walk corpus")
    sys.exit(1)
print(f"[round_close] walk-family gate OK: {fam:.1f}s <= 6x probe ({probe:.2f}s)")
print(f"[round_close] gate OK: {len(covered)} queries covered, "
      f"{len(errs)} errors{': ' + str(errs) if errs else ''}, "
      f"total {bench.get('value')}s, probe {bench.get('probe', {}).get('median')}s")
EOF

# movers block (round-15 verdict item 5: the window-drift explanation was
# narrative — "broad uniform movers = box drift" — and got load-bearing).
# CAVEAT (round 17): isolated_norm is UPWARD-biased for queries whose
# cost amortizes shared published-table reads across their family (the
# isolated subset denies the family) — adjudicate a confirmed mover by
# re-running it WITH its family on a quiet window and record the result
# in movers.builder_recheck, as the round-17 close did.
# Any common query whose probe-normalized median moved >1.5x vs the
# PREVIOUS close gets an automatic isolated re-run (fresh JVM, 3 medians,
# its own probe bracket) appended to the artifact, so the next judge
# reads confirmations, not prose.
PREV="BENCH_full_r$((N-1)).json"
if [ -f "$PREV" ]; then
  MOVERS=$(python3 - "$OUT" "$PREV" <<'EOF'
import json, sys
cur, prev = json.load(open(sys.argv[1])), json.load(open(sys.argv[2]))
pc, pp = cur.get("probe", {}).get("median"), prev.get("probe", {}).get("median")
if not pc or not pp:
    sys.exit(0)  # no probe → cannot normalize; the walk gate already failed
movers = []
for q, m in cur.get("queries", {}).items():
    pm = prev.get("queries", {}).get(q)
    if pm and pm > 0 and (m / pc) / (pm / pp) > 1.5:
        movers.append(q)
print(",".join(sorted(movers)))
EOF
)
  if [ -n "$MOVERS" ]; then
    echo "[round_close] movers >1.5x probe-normalized vs $PREV: $MOVERS — isolated re-run"
    # log stderr and check the exit status (round-16 advice: 2>/dev/null
    # plus an unchecked pipe left a failed re-run to surface only as a
    # cryptic json.load error — the exact silent-failure shape the
    # STREAM_LOG handling below was added to prevent)
    MOVERS_LOG=/tmp/graft_movers_bench.log
    if ! SPARK_GRAFT_BENCH_ONLY="$MOVERS" \
        SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
        scripts/run_verify.sh graft.Bench > /tmp/graft_movers.out 2> "$MOVERS_LOG"; then
      echo "[round_close] MOVERS RE-RUN FAILED — tail of $MOVERS_LOG:"
      tail -30 "$MOVERS_LOG"
      exit 1
    fi
    tail -1 /tmp/graft_movers.out > /tmp/graft_movers.json
  fi
  python3 - "$OUT" "$PREV" "$MOVERS" <<'EOF'
import json, sys
cur, prev = json.load(open(sys.argv[1])), json.load(open(sys.argv[2]))
movers = [m for m in (sys.argv[3].split(",") if len(sys.argv) > 3 else []) if m]
pc = cur["probe"]["median"]; pp = prev["probe"]["median"]
entries = {}
if movers:
    iso = json.load(open("/tmp/graft_movers.json"))
    ip = iso.get("probe", {}).get("median")
    for q in movers:
        entries[q] = {
            "prev_median": prev["queries"][q], "prev_probe": pp,
            "cur_median": cur["queries"][q], "cur_probe": pc,
            "norm_ratio": round((cur["queries"][q] / pc) / (prev["queries"][q] / pp), 3),
            "isolated_median": iso.get("queries", {}).get(q),
            "isolated_spread": iso.get("spread", {}).get(q),
            "isolated_probe": ip,
            "isolated_norm_vs_prev": (
                round((iso["queries"][q] / ip) / (prev["queries"][q] / pp), 3)
                if ip and iso.get("queries", {}).get(q) else None),
        }
cur["movers"] = {"threshold": 1.5, "vs": sys.argv[2], "entries": entries}
json.dump(cur, open(sys.argv[1], "w"))
conf = [q for q, e in entries.items()
        if e["isolated_norm_vs_prev"] and e["isolated_norm_vs_prev"] > 1.5]
print(f"[round_close] movers block: {len(entries)} movers, "
      f"{len(conf)} confirmed by isolated re-run"
      + (f" — INVESTIGATE: {conf}" if conf else ""))
EOF
else
  echo "[round_close] no $PREV — skipping movers block (first recorded round)"
fi

# streaming bench re-record (round-14 verdict item 4: BENCH_streaming.json
# went seven rounds stale while ~15 stateful sinks shipped unbenched —
# recording it HERE means it can never silently stale again). Skippable
# only explicitly, for local dry runs.
if [ -z "$SPARK_GRAFT_SKIP_STREAM_BENCH" ]; then
  echo "[round_close] re-recording BENCH_streaming.json (pipelines + stateful sinks)"
  # log to a file, not /dev/null — a failed recording must leave diagnostics
  STREAM_LOG=/tmp/graft_stream_bench.log
  if ! scripts/run_verify.sh graft.StreamBench BENCH_streaming.json > "$STREAM_LOG" 2>&1; then
    echo "[round_close] STREAMING BENCH FAILED — tail of $STREAM_LOG:"
    tail -30 "$STREAM_LOG"
    exit 1
  fi
  python3 - BENCH_streaming.json <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
# a filtered recording must never ship even if the unset above is bypassed
# (StreamBench stamps filtered=true whenever SPARK_GRAFT_STREAM_ONLY was set)
if d.get("filtered"):
    print("[round_close] STREAMING GATE FAILED: recording was filtered by "
          "SPARK_GRAFT_STREAM_ONLY — re-record with the full sink set")
    sys.exit(1)
# every sink must show life at SOME rate step (batches >= 1) — a sink that
# records 0 batches at every rate is a dead recording, not a slow sink
# (the classifier gate legitimately records batches=0 at 200k rps only)
dead = []
for name, steps in d.get("sinks", {}).items():
    rates = steps if isinstance(steps, list) else steps.get("rates", [])
    if not any((r.get("batches", 0) or 0) >= 1 for r in rates):
        dead.append(name)
if dead:
    print(f"[round_close] STREAMING GATE FAILED: sinks with 0 batches at "
          f"every rate step: {dead}")
    sys.exit(1)
print(f"[round_close] streaming OK: headline {d['value']:.0f} rows/s, "
      f"{len(d['pipelines'])} pipelines, {len(d.get('sinks', {}))} sinks, "
      f"all sinks alive")
EOF
else
  echo "[round_close] SKIPPED streaming bench (SPARK_GRAFT_SKIP_STREAM_BENCH set)"
fi

# IVF serving bench (round-16 verdict item 5): re-record per round at the
# driver's local[32] config so the serving numbers can never go stale.
# Gates: recall floors (verdict item 4; floors under the measured values
# with retrain margin), the shuffled-vs-broadcast price of scale-safety
# (verdict item 1), and per-query pruned cost <= 2x the prior round.
if [ -z "$SPARK_GRAFT_SKIP_IVF_BENCH" ]; then
  IVF_OUT="BENCH_ivf_serving_r${N}.json"
  IVF_LOG=/tmp/graft_ivf_bench.log
  echo "[round_close] recording $IVF_OUT (every-customer cohort + 10x-nlist sweep)"
  if ! SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
      SPARK_GRAFT_IVF_NLIST_SWEEP=1 \
      scripts/run_verify.sh graft.IvfServingBench > /tmp/graft_ivf_bench.out 2> "$IVF_LOG"; then
    echo "[round_close] IVF SERVING BENCH FAILED — tail of $IVF_LOG:"
    tail -30 "$IVF_LOG"
    exit 1
  fi
  tail -1 /tmp/graft_ivf_bench.out > "$IVF_OUT"
  python3 - "$IVF_OUT" "BENCH_ivf_serving_r$((N-1)).json" <<'EOF'
import json, os, sys
d = json.load(open(sys.argv[1]))
fail = []
# recall floors — measured r17: 0.90 / 0.91 / 0.86; floors leave retrain
# margin but catch a selection regression outright
floors = {"recall_at_5": 0.80, "linkpred_recall_at_5": 0.85,
          "hier_recall_at_5": 0.75}
for key, floor in floors.items():
    v = d.get(key)
    if v is None:
        fail.append(f"{key} missing from the recording")
    elif v < floor:
        fail.append(f"{key}={v:.3f} < floor {floor}")
# the scale-safe shuffled spelling must stay within 2x of the broadcast
# one (measured r17: 1.03x) — a blowup means the cluster shuffle lost
# its balance and the de-broadcast path is no longer a viable fallback
ps, bs = d.get("pruned_shuffled_sec", {}).get("median"), d.get("pruned_sec", {}).get("median")
if not ps or not bs:
    fail.append("pruned/shuffled medians missing")
elif ps > 2.0 * bs:
    fail.append(f"shuffled spelling {ps:.2f}s > 2x broadcast {bs:.2f}s")
# per-query pruned cost vs the prior round (<= 2x, both normalized to
# their own cohort sizes; first recorded round passes vacuously)
prev_path = sys.argv[2]
if os.path.exists(prev_path):
    p = json.load(open(prev_path))
    cur_ms = d["pruned_sec"]["median"] / max(1, d["queries"]) * 1000
    prv_ms = p["pruned_sec"]["median"] / max(1, p["queries"]) * 1000
    if cur_ms > 2.0 * prv_ms:
        fail.append(f"pruned per-query {cur_ms:.3f} ms/q > 2x prior {prv_ms:.3f}")
    else:
        print(f"[round_close] ivf serving per-query OK: {cur_ms:.3f} ms/q "
              f"(prior {prv_ms:.3f})")
else:
    print(f"[round_close] no {prev_path} — per-query gate vacuous this round")
if fail:
    print("[round_close] IVF SERVING GATE FAILED: " + "; ".join(fail))
    sys.exit(1)
sw = d.get("nlist_sweep", {})
print(f"[round_close] ivf serving OK: pruned {bs:.2f}s (shuffled {ps:.2f}s), "
      f"recalls nbr={d['recall_at_5']:.2f} lp={d['linkpred_recall_at_5']:.2f} "
      f"hier={d['hier_recall_at_5']:.2f}; 10x-nlist sweep pruned "
      f"{sw.get('pruned_sec', {}).get('median')}s vs hier "
      f"{sw.get('hier_pruned_sec', {}).get('median')}s")
EOF
else
  echo "[round_close] SKIPPED ivf serving bench (SPARK_GRAFT_SKIP_IVF_BENCH set)"
fi
