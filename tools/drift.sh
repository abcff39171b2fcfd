#!/usr/bin/env bash
# Automated bench-drift A/B (the gate's answer to "did the board really
# get slower, or is the box noisy?"): compare the just-written
# bench_latest.json against the last COMMITTED bench at the SAME scale
# factor — per-SF reference files (bench_latest.sf0.01.json,
# bench_latest.sf0.1.json, …) written by every full Bench run, so the
# driver's sf0.1 board and the gate's sf0.01 board each have their own
# regression baseline (round-14 verdict: one shared latest-file SKIPped
# on SF mismatch and left the sf0.1 slow tail unguarded). When the
# shared-green total moved >15%, OR any individual shared-green query
# moved >30% AND >1 s (round-16: single-query regressions hid inside a
# faster board total), rebuild the prior reference's commit in a
# scratch git worktree, re-time the flagged queries THERE and HERE
# back-to-back (same box, same minutes), and append the A/B table to
# docs/SCALING.md — the round-12 manual worktree procedure, automated
# so a drifting close can never ship without its defense. A contended
# A/B pass (Bench's probe sentinel) is discarded, not reported.
#
# Exit 0 always unless the comparison itself is impossible: drift is a
# diagnostic, not a gate failure — the TABLE is the deliverable.
set -uo pipefail
cd "$(dirname "$0")/.."

NEW=bench_latest.json
[ -f "$NEW" ] || { echo "drift: no $NEW; run Bench first" >&2; exit 1; }

SF_NAME=$(python3 -c "import json,os;print(os.path.basename(json.load(open('$NEW'))['sf'].rstrip('/')))")
REF="bench_latest.$SF_NAME.json"
PREV_COMMIT=$(git log -n1 --format=%H -- "$REF" 2>/dev/null || true)
PREV_FILE="$REF"
if [ -z "$PREV_COMMIT" ]; then
  # bootstrap: before the first per-SF reference exists, fall back to the
  # legacy shared file — same-SF is still enforced inside the comparison
  PREV_COMMIT=$(git log -n1 --format=%H -- "$NEW" 2>/dev/null || true)
  PREV_FILE="$NEW"
fi
if [ -z "$PREV_COMMIT" ]; then
  echo "drift: no committed bench to compare against — skipping"
  exit 0
fi
git show "$PREV_COMMIT:$PREV_FILE" > /tmp/graft_bench_prev.json 2>/dev/null || {
  echo "drift: prior $PREV_FILE unreadable at $PREV_COMMIT — skipping"; exit 0; }

VERDICT=$(python3 - "$NEW" /tmp/graft_bench_prev.json <<'EOF'
import json, sys
new = json.load(open(sys.argv[1])); prev = json.load(open(sys.argv[2]))
if new.get("sf") != prev.get("sf"):
    print("SKIP sf-mismatch", new.get("sf"), prev.get("sf")); raise SystemExit
# Compare over the INTERSECTION of query keys: a round that adds queries
# inflates the full-board total without any regression, and a query only
# one side knows can never be A/B'd in the prior HEAD anyway.
shared = sorted(set(new["queries"]) & set(prev["queries"]))
if not shared:
    print("SKIP no-shared-queries"); raise SystemExit
# A negative entry is Bench's failure sentinel (a watchdog timeout reads
# ~-180). Folding its magnitude into a timing total lets one flipped
# failure dominate the ratio (round-14 advice), so the timing comparison
# runs only over queries green on BOTH sides; failure-set CHANGES are
# reported on their own line — a newly-failing query is worse news than
# any drift percentage and must not hide inside (or get excluded from) a
# timing average.
green = [q for q in shared
         if new["queries"][q] >= 0 and prev["queries"][q] >= 0]
newly_bad = [q for q in shared
             if new["queries"][q] < 0 <= prev["queries"][q]]
newly_ok = [q for q in shared
            if prev["queries"][q] < 0 <= new["queries"][q]]
if newly_bad:
    print("FAILSET newly-failing:" + ",".join(newly_bad)
          + (" newly-fixed:" + ",".join(newly_ok) if newly_ok else ""))
    raise SystemExit
if not green:
    print("SKIP no-shared-green"); raise SystemExit
nt = sum(new["queries"][q] for q in green)
pt = sum(prev["queries"][q] for q in green)
drift = abs(nt - pt) / max(pt, 1e-9)
fixed = f" (newly-fixed: {','.join(newly_ok)})" if newly_ok else ""
# PER-QUERY guard (round-16 verdict task 1): a single query regressing
# hard can hide inside a green — even FASTER — board total (round 15:
# q200 +27% and q212 +32% inside an 8%-faster board). Flag any
# shared-green query that moved >30% AND >1 s absolute; the A/B runs on
# the flagged set even when the total needs no defense.
movers = sorted(q for q in green
                if new["queries"][q] > prev["queries"][q] * 1.30
                and new["queries"][q] - prev["queries"][q] > 1.0)
# The scratch-worktree A/B defends against REGRESSIONS; a faster board
# needs no defense, however large the move (round-15 gate burned ~10
# bench-minutes re-proving a 20% improvement) — report it and move on
# (unless an individual query drifted — the per-query guard overrides).
if nt <= pt and not movers:
    print(f"OK {drift:.3f}-faster ({pt:.1f}s -> {nt:.1f}s over "
          f"{len(green)} shared-green){fixed}")
    raise SystemExit
if drift <= 0.15 and not movers:
    print(f"OK {drift:.3f} ({pt:.1f}s -> {nt:.1f}s over {len(green)} "
          f"shared-green){fixed}")
    raise SystemExit
if drift > 0.15 and nt > pt:
    top5 = [k for k, _ in sorted(((q, new["queries"][q]) for q in green),
                                 key=lambda kv: -kv[1])[:5]]
    flagged = sorted(set(top5) | set(movers))
    print("DRIFT", f"{drift:.3f}", ",".join(flagged), "total")
else:
    print("DRIFT", f"{drift:.3f}", ",".join(movers), "per-query")
EOF
)
case "$VERDICT" in
  FAILSET*)
    # a failure-set change is its own deliverable: loud, but still exit 0
    # (the oracle gate, not drift, owns correctness failure)
    echo "drift: $VERDICT" ; exit 0 ;;
  OK*|SKIP*) echo "drift: $VERDICT"; exit 0 ;;
  DRIFT*) ;;
  *) echo "drift: unparseable bench JSONs ($VERDICT) — skipping"; exit 0 ;;
esac
PCT=$(echo "$VERDICT" | awk '{print $2}')
QUERIES=$(echo "$VERDICT" | awk '{print $3}' | tr ',' ' ')
REASON=$(echo "$VERDICT" | awk '{print $4}')
SF=$(python3 -c "import json;print(json.load(open('$NEW'))['sf'])")
echo "drift: $REASON drift (total ${PCT}) — A/B on: $QUERIES (sf=$SF, base=$PREV_COMMIT)"

# Per-run scratch for the A/B JSONs: two drift runs on the same box
# (the sf0.01 gate and the sf0.1 driver board run separately) would
# clobber fixed /tmp names and append a table built from the other
# run's numbers (round-16 ADVICE).
AB_DIR=$(mktemp -d /tmp/graft-abjson.XXXXXX)
WT=$(mktemp -d /tmp/graft-ab.XXXXXX)
rmdir "$WT"
git worktree add --detach "$WT" "$PREV_COMMIT" >/dev/null 2>&1 || {
  echo "drift: worktree add failed — skipping A/B" >&2; exit 0; }
trap 'git worktree remove --force "$WT" >/dev/null 2>&1 || true' EXIT

# back-to-back, same box: prior HEAD first, current tree second
( cd "$WT" && env SPARK_GRAFT_SF_DIR="$SF" \
    SPARK_GRAFT_BENCH_OUT=$AB_DIR/prev.json \
    sbt -batch "runMain graft.Bench $QUERIES" >/dev/null 2>&1 ) || {
  echo "drift: prior-HEAD bench failed — skipping A/B" >&2; exit 0; }
env SPARK_GRAFT_SF_DIR="$SF" \
    SPARK_GRAFT_BENCH_OUT=$AB_DIR/new.json \
    sbt -batch "runMain graft.Bench $QUERIES" >/dev/null 2>&1 || {
  echo "drift: current-HEAD bench failed — skipping A/B" >&2; exit 0; }

# Bench records its contention sentinel (probe_sec/contended) in every
# output, A/B runs included — a contended A/B pass is box noise wearing
# a regression costume, so DISCARD it loudly instead of appending a
# misleading table (round-15 advice item 8).
AB_OK=$(python3 -c "
import json
p = json.load(open('$AB_DIR/prev.json'))
n = json.load(open('$AB_DIR/new.json'))
print('no' if p.get('contended') or n.get('contended') else 'yes')")
if [ "$AB_OK" != yes ]; then
  echo "drift: A/B DISCARDED — a pass was contended (probe series kept" \
       "in $AB_DIR/{prev,new}.json); re-run on an idle box"
  exit 0
fi

python3 - "$PREV_COMMIT" "$PCT" "$REASON" "$AB_DIR" <<'EOF' >> docs/SCALING.md
import json, subprocess, sys
prev = json.load(open(sys.argv[4] + "/prev.json"))
new = json.load(open(sys.argv[4] + "/new.json"))
head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                      capture_output=True, text=True).stdout.strip()
def med(js):
    s = sorted(js.get("probe_sec", []) or [0.0])
    return s[len(s) // 2]
print(f"\n## Bench-drift A/B (auto, gate): {sys.argv[1][:8]} -> {head}")
scope = ("top-5 slowest" if sys.argv[3] == "total"
         else "individually-flagged (>30% and >1s) queries")
print(f"\n{sys.argv[3]} drift {float(sys.argv[2])*100:.0f}% vs the last "
      f"committed bench at the same SF ({new['sf']}); {scope} re-timed "
      "back-to-back in a scratch worktree of the prior HEAD vs the "
      "current tree (min of the same pass policy, same box; both passes "
      f"uncontended, probe medians prior={med(prev):.2f}s "
      f"current={med(new):.2f}s).")
print("\n| query | prior HEAD (s) | current (s) |")
print("|---|---|---|")
for q in sorted(new["queries"]):
    print(f"| {q} | {prev['queries'].get(q, float('nan')):.2f} "
          f"| {new['queries'][q]:.2f} |")
EOF
# success path: the JSONs are folded into the table above — drop the
# scratch dir (it is kept only on the contended-discard path, where the
# message points users at the preserved probe series)
rm -rf "$AB_DIR"
echo "drift: A/B table appended to docs/SCALING.md"
