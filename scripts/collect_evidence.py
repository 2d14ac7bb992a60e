"""Collect the round's measurement logs into committed artifacts.

Reads /tmp/evidence/*.log (written by scripts/evidence_queue_r3.sh), pulls
the one-line JSON results out of each bench log, and writes:

  EVIDENCE.json  — every metric, keyed by measurement name, with the
                   queue's raw command context
  (accuracy_report.json from the accuracy step is copied to ACCURACY.json
   by the caller — it is already a single JSON document)

Usage: python scripts/collect_evidence.py [evidence_dir] [out_json]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ev_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/evidence")
out = Path(sys.argv[2] if len(sys.argv) > 2 else "EVIDENCE.json")

results: dict[str, object] = {}
for log in sorted(ev_dir.glob("*.log")):
    name = log.stem
    if name == "queue":
        continue
    lines = [
        ln
        for ln in log.read_text(errors="replace").splitlines()
        if not ln.startswith("WARNING") and ln.strip()
    ]
    jsons = []
    for ln in lines:
        m = re.search(r"\{.*\}\s*$", ln)
        if m:
            try:
                jsons.append(json.loads(m.group(0)))
            except json.JSONDecodeError:
                pass
    if jsons:
        results[name] = jsons if len(jsons) > 1 else jsons[0]
    else:
        # Non-JSON logs (profiles, parity): keep the meaningful tail.
        results[name] = {"raw_tail": lines[-12:]}

out.write_text(json.dumps(results, indent=2) + "\n")
print(f"wrote {out} with {len(results)} entries")
