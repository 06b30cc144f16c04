#!/usr/bin/env python3
"""Tests for the two load-bearing gate tools (judge r11 #6): every round's
green/red verdict flows through check_correctness.py canon()/compare and
check_bench.py's pin logic, but until now only the happy paths were
exercised by real runs. Each test drives the tool as a subprocess with a
synthetic fixture and asserts on the verdict lines + exit code — the same
interface the driver and round_gate.sh consume.

Run directly (`python3 tools/test_check_tools.py`) or via pytest.
"""
import json
import os
import subprocess
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

TOOLS = os.path.dirname(os.path.abspath(__file__))


def run_correctness(out_dir, sf_dir=None, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    # sf_dir may be any empty dir: oracle SQL literals need no tables.
    sf = sf_dir or tempfile.mkdtemp(prefix="sf-empty-")
    p = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "check_correctness.py"), sf, out_dir],
        capture_output=True, text=True, env=e,
    )
    return p.stdout


def dump(out_dir, name, table):
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))


def fixture(oracle):
    out = tempfile.mkdtemp(prefix="verify-fix-")
    with open(os.path.join(out, "oracle_sql.json"), "w") as f:
        json.dump(oracle, f)
    return out


def verdict_line(report, name):
    for line in report.splitlines():
        if line.strip().startswith(f"{name}:") or line.strip().startswith(f"✗ {name}:"):
            return line
    raise AssertionError(f"no verdict line for {name} in:\n{report}")


# --- check_correctness.py -------------------------------------------------

def test_exact_match_ok():
    out = fixture({"q": "SELECT CAST(1 AS BIGINT) AS a, 'x' AS b"})
    dump(out, "q", pa.table({"a": pa.array([1], pa.int64()), "b": ["x"]}))
    r = run_correctness(out)
    assert "OK (1 rows)" in verdict_line(r, "q")
    assert "1 exact-match" in r and "0 FAILING" in r


def test_uint64_overflow_fails_loudly():
    # A uint64 above int64.max must raise inside canon() (CANON-ERROR), not
    # wrap under astype into a fake int64 value.
    out = fixture({"q": "SELECT CAST(1 AS BIGINT) AS a"})
    dump(out, "q", pa.table({"a": pa.array([2**63 + 41], pa.uint64())}))
    r = run_correctness(out)
    line = verdict_line(r, "q")
    assert "CANON-ERROR" in line and "exceeds int64 range" in line
    assert "1 FAILING" in r


def test_lossless_uint_canonicalizes_ok():
    # Within-family width canonicalization must stay lenient: uint32 vs the
    # oracle's BIGINT is the exact int32-vs-int64 case the driver tolerates.
    out = fixture({"q": "SELECT CAST(7 AS BIGINT) AS a"})
    dump(out, "q", pa.table({"a": pa.array([7], pa.uint32())}))
    r = run_correctness(out)
    assert "OK (1 rows)" in verdict_line(r, "q")


def test_cross_family_dtype_fails():
    # Values equal (1.0 == 1) but float64 vs int64: the driver's typed hash
    # fails this, so the local gate must too (the r9 corpus_epochs lesson).
    out = fixture({"q": "SELECT CAST(1 AS BIGINT) AS a"})
    dump(out, "q", pa.table({"a": pa.array([1.0], pa.float64())}))
    r = run_correctness(out)
    line = verdict_line(r, "q")
    assert "DTYPE" in line and "values equal but dtypes differ" in line
    assert "1 FAILING" in r


def test_value_diff_fails():
    out = fixture({"q": "SELECT CAST(2 AS BIGINT) AS a"})
    dump(out, "q", pa.table({"a": pa.array([3], pa.int64())}))
    r = run_correctness(out)
    assert "VALUES:" in verdict_line(r, "q")
    assert "1 FAILING" in r


def test_rowcount_diff_fails():
    out = fixture({"q": "SELECT CAST(1 AS BIGINT) AS a"})
    dump(out, "q", pa.table({"a": pa.array([1, 1], pa.int64())}))
    r = run_correctness(out)
    assert "ROWCOUNT: mine=2 ref=1" in verdict_line(r, "q")


def test_missing_dump_fails():
    # An oracle entry with no dump dir must be a loud failing row (the
    # round-5 vanishing-queries lesson), wired to Verify's _failures.json.
    out = fixture({"gone": "SELECT 1 AS a"})
    with open(os.path.join(out, "_failures.json"), "w") as f:
        json.dump({"gone": "AnalysisException: boom"}, f)
    r = run_correctness(out)
    line = verdict_line(r, "gone")
    assert "MISSING-DUMP" in line and "boom" in line
    assert "1 FAILING" in r


def test_rows_only_without_oracle():
    out = fixture({})
    dump(out, "noracle", pa.table({"a": pa.array([1], pa.int64())}))
    r = run_correctness(out)
    assert "rows-only (1 rows)" in verdict_line(r, "noracle")
    assert "0 FAILING" in r


# --- check_bench.py -------------------------------------------------------

def run_bench_gate(bench_obj, pins, factor=None):
    tmp = tempfile.mkdtemp(prefix="bench-fix-")
    baseline = os.path.join(tmp, "BASELINE.json")
    with open(baseline, "w") as f:
        json.dump({"per_query_pins_sec": pins}, f)
    inp = os.path.join(tmp, "bench.out")
    with open(inp, "w") as f:
        f.write("WARN: sbt noise line\n")
        f.write(json.dumps(bench_obj) + "\n")
        f.write("[success] Total time: 1 s\n")
    env = dict(os.environ, BASELINE_JSON=baseline)
    if factor:
        env["PIN_FACTOR"] = str(factor)
    p = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "check_bench.py"), inp],
        capture_output=True, text=True, env=env,
    )
    return p.returncode, p.stdout


def test_bench_all_green():
    rc, out = run_bench_gate({"queries": {"q1": 1.0}, "failed": []}, {"q1": 0.9})
    assert rc == 0 and "ok q1" in out and "0 failing" in out


def test_bench_negative_sec_fails():
    # sec = -1.0 marks a query that threw; must fail in the per-query loop
    # even when bench['failed'] is (wrongly) empty.
    rc, out = run_bench_gate({"queries": {"q1": -1.0}, "failed": []}, {"q1": 0.9})
    assert rc == 1 and "BROKEN: q1 failed in bench (sec=-1.0)" in out
    assert "ok q1" not in out


def test_bench_unpinned_query_fails():
    rc, out = run_bench_gate({"queries": {"newq": 0.5}, "failed": []}, {})
    assert rc == 1 and "UNPINNED: newq" in out


def test_bench_missing_pinned_query_fails():
    rc, out = run_bench_gate({"queries": {}, "failed": []}, {"gone": 1.0})
    assert rc == 1 and "MISSING: pinned query gone was not measured" in out


def test_bench_planted_3x_regression_fails():
    rc, out = run_bench_gate({"queries": {"q1": 3.0}, "failed": []}, {"q1": 1.0})
    assert rc == 1 and "REGRESSION: q1 3.000s > 2.0x pin 1.000s" in out


def test_bench_within_2x_passes_and_custom_factor_tightens():
    rc, _ = run_bench_gate({"queries": {"q1": 1.9}, "failed": []}, {"q1": 1.0})
    assert rc == 0
    rc, out = run_bench_gate({"queries": {"q1": 1.9}, "failed": []}, {"q1": 1.0}, factor=1.5)
    assert rc == 1 and "REGRESSION" in out


def test_bench_failed_list_fails():
    rc, out = run_bench_gate({"queries": {"q1": 1.0}, "failed": ["q2"]}, {"q1": 0.9})
    assert rc == 1 and "bench reported failed queries" in out


def test_bench_no_json_line_fails():
    tmp = tempfile.mkdtemp(prefix="bench-fix-")
    baseline = os.path.join(tmp, "BASELINE.json")
    with open(baseline, "w") as f:
        json.dump({"per_query_pins_sec": {}}, f)
    inp = os.path.join(tmp, "bench.out")
    with open(inp, "w") as f:
        f.write("only sbt noise here\n")
    p = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "check_bench.py"), inp],
        capture_output=True, text=True, env=dict(os.environ, BASELINE_JSON=baseline),
    )
    assert p.returncode == 1 and "no bench JSON line" in p.stdout


def test_bench_tail_truncated_samples_line_still_parses():
    # r13 verdict #1: the driver's tail-capture window truncated the single
    # giant samples-bearing bench line mid-token, recording parsed=null.
    # Bench now emits the bulky samples line FIRST and the compact summary
    # LAST; this test replays the driver's failure mode — keep only the
    # last 4 KB of stdout — and asserts the gate still finds the summary.
    tmp = tempfile.mkdtemp(prefix="bench-trunc-")
    baseline = os.path.join(tmp, "BASELINE.json")
    with open(baseline, "w") as f:
        json.dump({"per_query_pins_sec": {"q1": 0.9}}, f)
    samples_line = json.dumps({
        "metric": "samples",
        "samples": {f"q{i}": [1.234] * 400 for i in range(40)},  # ~130 KB
        "runs": 10, "sf": "sf0.1",
    })
    summary_line = json.dumps({
        "metric": "total", "value": 1.0, "unit": "sec",
        "queries": {"q1": 1.0}, "failed": [], "sf": "sf0.1",
    })
    full = "WARN noise\n" + samples_line + "\n" + summary_line + "\n"
    assert len(samples_line) > 8192  # the samples line alone must overflow any tail window
    inp = os.path.join(tmp, "bench.out")
    with open(inp, "w") as f:
        f.write(full[-4096:])  # the driver's tail window: summary survives, samples don't
    p = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "check_bench.py"), inp],
        capture_output=True, text=True, env=dict(os.environ, BASELINE_JSON=baseline),
    )
    assert p.returncode == 0 and "ok q1" in p.stdout, p.stdout


def test_bench_samples_line_not_mistaken_for_summary():
    # The samples line has no "queries" key; even when it parses cleanly it
    # must not shadow the real summary (which precedes OR follows it).
    tmp = tempfile.mkdtemp(prefix="bench-twoline-")
    baseline = os.path.join(tmp, "BASELINE.json")
    with open(baseline, "w") as f:
        json.dump({"per_query_pins_sec": {"q1": 0.9}}, f)
    inp = os.path.join(tmp, "bench.out")
    with open(inp, "w") as f:
        f.write(json.dumps({"metric": "samples", "samples": {"q1": [1.0, 1.1]}}) + "\n")
        f.write(json.dumps({"metric": "total", "queries": {"q1": 1.0}, "failed": []}) + "\n")
        f.write(json.dumps({"metric": "samples", "samples": {"q1": [9.9]}}) + "\n")
    p = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "check_bench.py"), inp],
        capture_output=True, text=True, env=dict(os.environ, BASELINE_JSON=baseline),
    )
    assert p.returncode == 0 and "ok q1: 1.000s" in p.stdout, p.stdout


# --- check_dumps_equal.py ---------------------------------------------------

def _dump_pair(tmp, rows_a, rows_b):
    a = os.path.join(tmp, "a"); b = os.path.join(tmp, "b")
    for d, rows in ((a, rows_a), (b, rows_b)):
        os.makedirs(os.path.join(d, "q"), exist_ok=True)
        pq.write_table(
            pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                      "v": [r[1] for r in rows]}),
            os.path.join(d, "q", "part-0.parquet"),
        )
    return a, b


def _run_dumps_equal(a, b, only=None):
    cmd = [sys.executable, os.path.join(TOOLS, "check_dumps_equal.py"), a, b]
    if only:
        cmd.append(only)
    return subprocess.run(cmd, capture_output=True, text=True)


def test_dumps_equal_same_multiset_different_order_passes():
    tmp = tempfile.mkdtemp(prefix="dumps-ok-")
    a, b = _dump_pair(tmp, [(1, "x"), (2, "y"), (2, "y")], [(2, "y"), (1, "x"), (2, "y")])
    p = _run_dumps_equal(a, b)
    assert p.returncode == 0 and "ok q: 3 rows multiset-equal" in p.stdout, p.stdout


def test_dumps_equal_planted_content_diff_fails():
    # Same row COUNT, one value differs — the cross-process divergence the
    # multi-executor leg exists to catch must not pass on counts alone.
    tmp = tempfile.mkdtemp(prefix="dumps-bad-")
    a, b = _dump_pair(tmp, [(1, "x"), (2, "y")], [(1, "x"), (2, "z")])
    p = _run_dumps_equal(a, b)
    assert p.returncode == 1 and "CONTENT: q" in p.stdout, p.stdout


def test_dumps_equal_missing_query_dir_fails():
    tmp = tempfile.mkdtemp(prefix="dumps-miss-")
    a, b = _dump_pair(tmp, [(1, "x")], [(1, "x")])
    os.makedirs(os.path.join(a, "gone"))
    pq.write_table(pa.table({"k": pa.array([1], pa.int64())}),
                   os.path.join(a, "gone", "part-0.parquet"))
    p = _run_dumps_equal(a, b)
    assert p.returncode == 1 and "MISSING: gone" in p.stdout, p.stdout


def _sharded_fixture(tmp):
    """Tiny corpus with one exact-dup clone pair and one J>=0.6 near-dup
    pair per lang block, plus noise docs; returns (sf_dir, dump_dir).
    The expected pair set is hand-derivable: clones pair at J=1, the
    near-dup pair shares 3 of its 4-word union (J=0.75), noise pairs
    nothing."""
    sf = os.path.join(tmp, "sf"); os.makedirs(sf)
    docs = [
        (1, "en", "alpha beta gamma delta"),
        (2, "en", "alpha beta gamma delta"),          # clone of 1 -> J=1
        (3, "en", "alpha beta gamma epsilon"),        # J(1,3)=3/5=0.6
        (4, "en", "zeta eta theta iota kappa"),       # noise
        (5, "fr", "un deux trois quatre"),
        (6, "fr", "un deux trois cinq"),              # J(5,6)=3/5=0.6
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "lang": [d[1] for d in docs],
        "source": ["s"] * len(docs),
        "text": [d[2] for d in docs],
    }), f"{sf}/documents.parquet")
    # Expected pairs (d1 < d2, jaccard): the engine-equivalent dump.
    rows = [(1, 2, 1.0), (1, 3, 0.6), (2, 3, 0.6), (5, 6, 0.6)]
    dump = os.path.join(tmp, "dump"); os.makedirs(f"{dump}/dedup_jaccard")
    pq.write_table(pa.table({
        "d1": pa.array([r[0] for r in rows], pa.int64()),
        "d2": pa.array([r[1] for r in rows], pa.int64()),
        "jaccard": pa.array([r[2] for r in rows], pa.float64()),
    }), f"{dump}/dedup_jaccard/part-0.parquet")
    return sf, dump


def _run_sharded(sf, dump, tmp, shards=3):
    return subprocess.run(
        [sys.executable, os.path.join(TOOLS, "check_jaccard_sharded.py"),
         sf, dump, str(shards)],
        capture_output=True, text=True,
        env=dict(os.environ, PREP_DIR=os.path.join(tmp, "prep"),
                 ORACLE_MEM="4GB", ORACLE_SPILL="4GB"),
    )


def test_sharded_jaccard_exact_dump_passes():
    tmp = tempfile.mkdtemp(prefix="shardjac-ok-")
    sf, dump = _sharded_fixture(tmp)
    p = _run_sharded(sf, dump, tmp)
    assert p.returncode == 0 and "OK-AGG-SHARDED (4 rows" in p.stdout, p.stdout


def test_sharded_jaccard_content_regression_fails():
    # The exact failure mode the r12 row-count pin was blind to: same
    # NUMBER of pairs, one wrong value (a broken threshold trading pairs
    # one-for-one). The sharded multiset hash must catch it.
    tmp = tempfile.mkdtemp(prefix="shardjac-bad-")
    sf, dump = _sharded_fixture(tmp)
    rows = [(1, 2, 1.0), (1, 3, 0.6), (2, 4, 0.6), (5, 6, 0.6)]  # (2,3)->(2,4)
    pq.write_table(pa.table({
        "d1": pa.array([r[0] for r in rows], pa.int64()),
        "d2": pa.array([r[1] for r in rows], pa.int64()),
        "jaccard": pa.array([r[2] for r in rows], pa.float64()),
    }), f"{dump}/dedup_jaccard/part-0.parquet")
    p = _run_sharded(sf, dump, tmp)
    assert p.returncode == 1 and "FAIL: engine" in p.stdout, p.stdout


if __name__ == "__main__":
    # Plain-python runner (no pytest dependency in the gate path).
    fns = [(n, f) for n, f in sorted(globals().items())
           if n.startswith("test_") and callable(f)]
    failed = 0
    for n, f in fns:
        try:
            f()
            print(f"  ok {n}")
        except Exception as e:  # noqa: BLE001 — report and continue
            failed += 1
            print(f"✗ {n}: {e}")
    print(f"test_check_tools: {len(fns) - failed}/{len(fns)} passed")
    sys.exit(1 if failed else 0)
