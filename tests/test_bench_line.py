"""Pin the bench.py stdout-line budget.

The driver keeps only a ~2000-char stdout tail; round 2's bench line
exceeded it and BENCH_r02.json recorded ``"parsed": null`` — a silent
loss of the round's performance evidence. ``build_bench_line`` now emits
the headline-24 per-query timings plus family subtotals only, and must
stay under 1500 chars no matter how large the benched suite grows.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, HEADLINE_24, build_bench_line


def test_line_under_budget_at_current_suite():
    timings = {q: 123.456 for q in BENCH_QUERIES}
    line = build_bench_line(timings, 0.1)
    assert len(line) < 1500, len(line)
    parsed = json.loads(line)
    assert parsed["n_bench"] == len(BENCH_QUERIES)
    assert set(parsed["queries"]) == set(HEADLINE_24)


def test_line_under_budget_at_120_queries():
    # 48 future additions with adversarially long names still fit: they
    # fold into the "other" subtotal, never into per-query entries
    timings = {q: 9999.99 for q in BENCH_QUERIES}
    timings.update({f"future_extremely_long_query_name_number_{i:03d}": 42.0 for i in range(48)})
    line = build_bench_line(timings, 0.1)
    assert len(line) < 1500, len(line)
    parsed = json.loads(line)
    assert parsed["n_bench"] == len(timings)
    assert parsed["subtotals"]["other"] == 42.0 * 48


def test_value_is_headline24_total_and_errors_excluded():
    timings = {q: 1.0 for q in BENCH_QUERIES}
    timings["dedup_exact"] = -1.0  # ERROR sentinel must not poison sums
    line = json.loads(build_bench_line(timings, 0.01))
    assert line["value"] == float(len(HEADLINE_24) - 1)
    assert line["n_err"] == 1
    assert line["subtotals"]["all"] == float(len(BENCH_QUERIES) - 1)


def test_subtotals_partition_the_suite():
    timings = {q: 1.0 for q in BENCH_QUERIES}
    line = json.loads(build_bench_line(timings, 0.1))
    fam_sum = sum(v for k, v in line["subtotals"].items() if k != "all")
    assert fam_sum == line["subtotals"]["all"] == float(len(BENCH_QUERIES))
