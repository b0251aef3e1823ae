"""The driver captures only the LAST 2000 chars of bench.py stdout and
json-parses the final line. Round 2's line grew past the window and was
truncated mid-line (BENCH_r02.json "parsed": null) — these tests pin the
compact-line budget so the round artifact can never silently regress.

No SparkSession needed: compact_line is pure."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import LINE_BUDGET, compact_line

DRIVER_TAIL = 2000


def _payload(n_queries, qps=True):
    p = {
        "metric": "headline_queries_total",
        "value": 29.3,
        "unit": "sec",
        "queries": {f"query_name_number_{i:03d}": 0.1234 for i in range(n_queries)},
        "sf": 0.1,
    }
    if qps:
        p["qps"] = {
            "search_qps": 7.34,
            "ann_search_qps": 4.27,
            "ann_recall_at_10": 0.99,
            "ivfpq_recall_at_10": 0.93,
            "upsert_load_docs_per_s": 186304.0,
        }
    return p


def test_line_fits_driver_tail_and_parses():
    for n in (10, 50, 80, 120, 300):
        line = compact_line(_payload(n))
        assert len(line) + 1 <= DRIVER_TAIL, (n, len(line))
        assert len(line) <= LINE_BUDGET
        parsed = json.loads(line)
        for key in ("metric", "value", "unit", "queries", "sf"):
            assert key in parsed


def test_recall_included_when_it_fits():
    parsed = json.loads(compact_line(_payload(10)))
    assert parsed["recall"]["ann_recall_at_10"] == 0.99
    assert parsed["recall"]["ivfpq_recall_at_10"] == 0.93
    # throughput-only keys stay out of the recall summary except the
    # two serving-qps headline numbers
    assert "upsert_load_docs_per_s" not in parsed["recall"]


def test_folds_fast_queries_keeping_every_name():
    """A payload too big for per-query timings folds the fast tail into
    the space-joined "fast" string: every query NAME stays on the line
    before any is dropped."""
    p = _payload(60)
    parsed = json.loads(compact_line(p))
    assert "queries_omitted" not in parsed
    names = set(parsed["queries"]) | set(parsed.get("fast", "").split())
    assert names == set(p["queries"])
    if "fast" in parsed:
        assert parsed["fast_n"] == len(parsed["fast"].split())


def test_degrades_by_dropping_fastest_queries():
    p = _payload(300)
    parsed = json.loads(compact_line(p))
    assert parsed.get("queries_omitted", 0) > 0
    kept = len(parsed["queries"]) + len(parsed.get("fast", "").split())
    assert kept + parsed["queries_omitted"] == 300
    # the required keys always survive
    assert parsed["metric"] == "headline_queries_total"


def test_current_local_payload_fits():
    """The judge's r5 done-criterion: the REAL current payload compacts
    to <= 1700 chars (300 of driver-tail headroom) with every query
    name present."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "BENCH_LOCAL.json")
    if not os.path.exists(path):
        return
    payload = json.loads(open(path).read())
    line = compact_line(payload)
    assert len(line) <= 1700
    parsed = json.loads(line)
    assert parsed["queries"]
    names = set(parsed["queries"]) | set(parsed.get("fast", "").split())
    assert names == set(payload["queries"])
