#!/usr/bin/env python3
"""README staleness gate (round-14 verdict task 8, the reverse direction
of the generated counts): every `qN` the README's operator tables cite
must still exist as a registered query in the engine source. The counts
went gate-generated in round 14 so they cannot go stale; a RENAMED or
REMOVED query, though, would leave the README citing an id the driver
can no longer run — this greps both sides and fails the gate on any
dangling citation.

Source of truth for "exists": a string literal `"qN_..."` (or bare
`"qN"`) anywhere under src/main/scala/graft — exactly the key shape
every `queries`/`oracleSql` registration uses."""
import pathlib
import re
import sys

root = pathlib.Path(__file__).resolve().parent.parent
readme_ids = set(re.findall(r"\bq(\d+)\b", (root / "README.md").read_text()))
src_ids = set()
for p in (root / "src/main/scala/graft").rglob("*.scala"):
    src_ids |= set(re.findall(r'"q(\d+)[_"]', p.read_text()))

dangling = sorted(readme_ids - src_ids, key=int)
if dangling:
    print("README cites queries that no longer exist in src/main: "
          + ", ".join("q" + d for d in dangling), file=sys.stderr)
    sys.exit(1)
print(f"readme-check: {len(readme_ids)} cited ids all registered "
      f"({len(src_ids)} registered total)")
