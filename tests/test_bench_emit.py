"""The bench's final stdout line must survive the driver's bounded tail
capture (VERDICT r5 item 1: r5's 2,265-char line overflowed the ~2000-char
window and the driver recorded parsed:null). These tests pin the emit
contract: last line is valid JSON, carries the headline value, and stays
under the window no matter how many headline queries accumulate."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, compact_line


def _out(timings, with_sf1=True):
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "protocol": "median_of_3_interleaved",
    }
    if with_sf1:
        out["sf1"] = {"total": 48.1}
    return out


def test_compact_line_small_set_keeps_queries():
    timings = {"a6_grouped_pricing_summary": 0.5, "j1_inner_equijoin": 0.3}
    line = compact_line(_out(timings), timings)
    d = json.loads(line)
    assert d["value"] == 0.8 and d["queries"] == timings
    assert len(line) <= 1500


def test_compact_line_current_headline_fits():
    timings = {n: 1.234 for n in HEADLINE}
    line = compact_line(_out(timings), timings)
    d = json.loads(line)
    assert d["metric"] == "headline_queries_total"
    assert d["sf1_total"] == 48.1
    assert len(line) <= 1500


def test_compact_line_bounded_even_at_200_queries():
    timings = {f"q{i}_some_rather_long_query_name_suffix": 1.111 for i in range(200)}
    line = compact_line(_out(timings), timings)
    d = json.loads(line)
    assert d["value"] == round(1.111 * 200, 3)
    assert "queries" not in d  # too big — replaced by slowest_queries
    assert len(d["slowest_queries"]) == 10
    assert len(line) <= 1500


def test_compact_line_is_final_json_parseable_from_tail():
    # Simulate the driver: take the last 2000 chars of (detail + compact)
    # output and parse the final line.
    timings = {n: 1.234 for n in HEADLINE}
    out = _out(timings)
    stdout = json.dumps(out) + "\n" + compact_line(out, timings) + "\n"
    tail = stdout[-2000:]
    last = [ln for ln in tail.strip().splitlines() if ln.strip()][-1]
    d = json.loads(last)
    assert d["value"] == out["value"]
