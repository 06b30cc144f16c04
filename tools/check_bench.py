#!/usr/bin/env python3
"""Per-query bench regression gate.

Reads the one-line Bench JSON (from a file containing it, or stdin) and
asserts every query against `per_query_pins_sec` in BASELINE.json:

  - a pinned query slower than PIN_FACTOR (default 2.0) x its pin FAILS
    (box variance is ~+-20%, so 2x is a real regression, not noise);
  - a measured query with NO pin FAILS (every roster widening must pin
    its additions — otherwise a 3x slowdown in a new query moves no
    gated number, the exact r9-judge finding);
  - a pinned query that was not measured FAILS (roster shrank silently).

Exit 0 = all green; exit 1 = any failure, each printed on its own line.
"""
import sys, os, json

factor = float(os.environ.get("PIN_FACTOR", "2.0"))
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# BASELINE_JSON overrides the repo pin file — lets test_check_tools.py gate
# this gate against synthetic pins without touching the real baseline.
baseline_path = os.environ.get("BASELINE_JSON") or os.path.join(repo, "BASELINE.json")
pins = json.load(open(baseline_path))["per_query_pins_sec"]

raw = open(sys.argv[1]).read() if len(sys.argv) > 1 else sys.stdin.read()
# The bench line is the last stdout line that parses as a JSON object with
# a "queries" key (sbt noise / WARN lines surround it).
bench = None
for line in raw.splitlines():
    line = line.strip()
    if line.startswith("{"):
        try:
            d = json.loads(line)
            if "queries" in d:
                bench = d
        except json.JSONDecodeError:
            pass
if bench is None:
    print("check_bench: no bench JSON line found in input")
    sys.exit(1)

queries = bench["queries"]
fails = []
for name, sec in sorted(queries.items()):
    pin = pins.get(name)
    if sec < 0:
        # Bench marks a query that threw with sec = -1.0; fail it HERE so
        # the per-query log never prints a nonsensical "ok name: -1.000s"
        # (and so a negative time fails even if bench['failed'] were empty).
        fails.append(f"BROKEN: {name} failed in bench (sec={sec})")
    elif pin is None:
        fails.append(f"UNPINNED: {name} measured {sec:.3f}s but has no pin in BASELINE.json")
    elif sec > factor * pin:
        fails.append(f"REGRESSION: {name} {sec:.3f}s > {factor:.1f}x pin {pin:.3f}s")
    else:
        print(f"  ok {name}: {sec:.3f}s (pin {pin:.3f}s)")
for name in sorted(set(pins) - set(queries)):
    fails.append(f"MISSING: pinned query {name} was not measured")
if bench.get("failed"):
    fails.append(f"BROKEN: bench reported failed queries {bench['failed']}")

for f in fails:
    print("✗ " + f)
print(f"check_bench: {len(queries)} measured, {len(fails)} failing (factor {factor:.1f}x)")
sys.exit(1 if fails else 0)
