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


# -- r15: pinned host-band anchors (VERDICT r14 item 2) ----------------------


def test_anchors_are_headline_queries():
    from bench import ANCHORS

    for role, q in ANCHORS.items():
        assert q in HEADLINE, f"anchor {role} ({q}) must be measured in-process"


def test_compact_line_carries_anchor_seconds():
    from bench import ANCHORS

    timings = {n: 1.234 for n in HEADLINE}
    out = _out(timings)
    out["anchors"] = {
        role: {"query": q, "sec": timings[q]} for role, q in ANCHORS.items()
    }
    line = compact_line(out, timings)
    d = json.loads(line)
    assert d["anchors"] == {role: 1.234 for role in ANCHORS}
    assert len(line) <= 1500


def test_band_ratio_normalizes_uniform_host_slowdown():
    """A uniform 1.4x host slowdown (the r14 driver scenario): every raw
    ratio is ~1.4, the anchor band absorbs it, normalized ratios ~1.0,
    nothing flagged."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from band_ratio import band_and_ratios

    old = {"queries": {f"q{i}": 1.0 for i in range(20)}}
    old["queries"].update(
        g1_star_join_revenue=1.6, l2_lsh_rebuild_probe=5.0,
        s14_incremental_refresh=3.4,
    )
    new = {"queries": {k: round(v * 1.4, 3) for k, v in old["queries"].items()}}
    res = band_and_ratios(old, new)
    assert abs(res["band"] - 1.4) < 0.01
    assert res["flagged"] == []
    assert all(abs(r["normalized_ratio"] - 1.0) < 0.02 for r in res["rows"])


def test_band_ratio_flags_a_real_code_regression_under_contention():
    """A genuine 2x regression in ONE query must still be flagged even
    when the whole run is 1.3x slower from contention — and a query that
    merely rode the contention must not be."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from band_ratio import band_and_ratios

    old = {
        "queries": {
            "g1_star_join_revenue": 1.6, "l2_lsh_rebuild_probe": 5.0,
            "s14_incremental_refresh": 3.4, "innocent_query": 2.0,
            "regressed_query": 2.0,
        }
    }
    new = {
        "queries": {
            "g1_star_join_revenue": 1.6 * 1.3, "l2_lsh_rebuild_probe": 5.0 * 1.3,
            "s14_incremental_refresh": 3.4 * 1.3, "innocent_query": 2.0 * 1.3,
            "regressed_query": 2.0 * 1.3 * 2.0,
        }
    }
    res = band_and_ratios(old, new)
    assert res["flagged"] == ["regressed_query"]
    # anchors block (new-style detail) takes precedence over the fallback
    new2 = dict(new, anchors={
        "cpu_sql": {"query": "g1_star_join_revenue", "sec": 1.6 * 1.3},
        "write_io": {"query": "l2_lsh_rebuild_probe", "sec": 5.0 * 1.3},
        "pipeline_refresh": {"query": "s14_incremental_refresh", "sec": 3.4 * 1.3},
    })
    assert band_and_ratios(old, new2)["flagged"] == ["regressed_query"]


def test_band_ratio_flag_floor_suppresses_small_denominator_noise():
    """r16 (VERDICT r15 item 4, the g15 promise): a 1.7x mover whose NEW
    runtime is sub-2s is scheduling noise, not a regression — reported
    with a 'sub-floor' note, never flagged. A mover whose new runtime
    crosses the floor still flags."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from band_ratio import band_and_ratios

    old = {
        "queries": {
            "g1_star_join_revenue": 1.6, "l2_lsh_rebuild_probe": 5.0,
            "s14_incremental_refresh": 3.4,
            "g15_small_quantity_revenue": 0.84,  # the r15 small-denominator case
            "really_regressed": 1.5,
        }
    }
    new = {
        "queries": {
            "g1_star_join_revenue": 1.6, "l2_lsh_rebuild_probe": 5.0,
            "s14_incremental_refresh": 3.4,
            "g15_small_quantity_revenue": 1.45,  # 1.72x but still sub-floor
            "really_regressed": 3.2,             # 2.1x AND crosses the floor
        }
    }
    res = band_and_ratios(old, new)
    assert res["flagged"] == ["really_regressed"]
    notes = {r["query"]: r["note"] for r in res["rows"]}
    assert notes["g15_small_quantity_revenue"] == "sub-floor"
    assert notes["really_regressed"] == "FLAG"


def test_band_ratio_contention_sensitive_class_never_flags():
    """r16 (VERDICT r15 item 3): x15's two-writer probe amplifies host
    contention in a way single-stream anchors cannot normalize (2.5x
    same-code spread across quiet runs) — it is reported, annotated
    'contention-sensitive', and never flagged."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from band_ratio import band_and_ratios

    old = {
        "queries": {
            "g1_star_join_revenue": 1.6, "l2_lsh_rebuild_probe": 5.0,
            "s14_incremental_refresh": 3.4,
            "x15_txn_multi_writer_occ": 1.65,
        }
    }
    new = {
        "queries": {
            "g1_star_join_revenue": 1.6, "l2_lsh_rebuild_probe": 5.0,
            "s14_incremental_refresh": 3.4,
            "x15_txn_multi_writer_occ": 4.17,  # the r15 driver-run spread
        }
    }
    res = band_and_ratios(old, new)
    assert res["flagged"] == []
    notes = {r["query"]: r["note"] for r in res["rows"]}
    assert notes["x15_txn_multi_writer_occ"] == "contention-sensitive"


def test_band_ratio_subfloor_large_mover_still_flags():
    """ADVICE r16 (low): the 2s flag floor must not hide a genuine
    order-of-magnitude regression that stays sub-floor — a 6x normalized
    mover at 1.9s enters 'flagged'; the 1.7x g15-class noise case keeps
    its 'sub-floor' annotation."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from band_ratio import band_and_ratios

    old = {
        "queries": {
            "g1_star_join_revenue": 1.6, "l2_lsh_rebuild_probe": 5.0,
            "s14_incremental_refresh": 3.4,
            "g15_small_quantity_revenue": 0.84,
            "tiny_but_tanked": 0.3,
        }
    }
    new = {
        "queries": {
            "g1_star_join_revenue": 1.6, "l2_lsh_rebuild_probe": 5.0,
            "s14_incremental_refresh": 3.4,
            "g15_small_quantity_revenue": 1.45,  # 1.72x: still noise-class
            "tiny_but_tanked": 1.9,              # 6.3x, sub-floor: FLAG anyway
        }
    }
    res = band_and_ratios(old, new)
    assert res["flagged"] == ["tiny_but_tanked"]
    notes = {r["query"]: r["note"] for r in res["rows"]}
    assert notes["g15_small_quantity_revenue"] == "sub-floor"
    assert notes["tiny_but_tanked"] == "FLAG"


def test_band_ratio_class_mode_uses_nearest_anchor():
    """r17 (VERDICT r16 item 2, the a6 case): under a CPU-skewed
    contention band (cpu_sql anchor 2.1x, write anchors ~1.1x, geomean
    ~1.4x) the untouched CPU-bound a6 shape shows ~2x 'normalized' by
    the geomean — a construction artifact, not a regression. --mode
    class divides each query by ITS anchor class's ratio: a6 lands ~1.0
    against cpu_sql and stops flagging, while a genuine write-path
    regression still flags against its own quiet anchor."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from band_ratio import anchor_class, band_and_ratios

    # the class map routes the r16 cast as expected
    assert anchor_class("a6_grouped_pricing_summary") == "cpu_sql"
    assert anchor_class("l2_lsh_erase_probe") == "write_io"
    assert anchor_class("s14_incremental_refresh") == "pipeline_refresh"
    assert anchor_class("l2_stream_index_ingest") == "write_io"
    assert anchor_class("g1_star_join_revenue") == "cpu_sql"

    old = {
        "queries": {
            "g1_star_join_revenue": 1.0,       # cpu anchor
            "l2_lsh_rebuild_probe": 5.0,       # write anchor
            "s14_incremental_refresh": 3.0,    # pipeline anchor
            "a6_grouped_pricing_summary": 1.2, # untouched cpu shape
            "l2_lsh_erase_probe": 6.0,         # genuinely regressed write op
        }
    }
    new = {
        "queries": {
            "g1_star_join_revenue": 2.1,        # cpu contention: 2.1x
            "l2_lsh_rebuild_probe": 5.5,        # 1.1x
            "s14_incremental_refresh": 3.3,     # 1.1x
            "a6_grouped_pricing_summary": 2.6,  # ~2.17x raw — pure cpu band
            "l2_lsh_erase_probe": 11.0,         # 1.83x raw on a QUIET class
        }
    }
    geo = band_and_ratios(old, new)
    # geomean band (~1.37) under-corrects the cpu shape: a6 flags falsely
    assert "a6_grouped_pricing_summary" in geo["flagged"]
    cls = band_and_ratios(old, new, mode="class")
    notes = {r["query"]: r["note"] for r in cls["rows"]}
    rows = {r["query"]: r for r in cls["rows"]}
    assert rows["a6_grouped_pricing_summary"]["anchor_class"] == "cpu_sql"
    assert rows["a6_grouped_pricing_summary"]["normalized_ratio"] < 1.5
    assert notes["a6_grouped_pricing_summary"] == ""
    # the real write-path regression flags against its own quiet anchor —
    # and the geomean band MISSES it (1.83x raw / 1.37 band = 1.34): the
    # CPU-skewed band over-corrects quiet classes exactly as it
    # under-corrects CPU ones, the two halves of the r16 a6 lesson
    assert "l2_lsh_erase_probe" in cls["flagged"]
    assert "l2_lsh_erase_probe" not in geo["flagged"]
