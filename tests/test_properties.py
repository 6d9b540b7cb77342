"""Property-based tests (hypothesis) — the testing layer the reference
lacks entirely (SURVEY.md §5 'Not present'). Each property is checked
against a plain-Python reference implementation on randomized inputs.

Hypothesis drives data generation; each example runs through one shared
SparkSession (deadline disabled — JVM latency is not a property failure).
"""

from __future__ import annotations

from datetime import date, timedelta
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_hiscox_spark.functions.cleaning import parse_money, standardize_date
from etl_hiscox_spark.operators.windows import dedup_rank

SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def date_and_format(draw):
    d = draw(
        st.dates(min_value=date(1990, 1, 1), max_value=date(2035, 12, 31))
    )
    fmt = draw(st.sampled_from(["%Y-%m-%d", "%m/%d/%Y", "%Y/%m/%d"]))
    return d, d.strftime(fmt)


@given(st.lists(date_and_format(), min_size=1, max_size=20))
@SETTINGS
def test_standardize_date_roundtrip(spark, pairs):
    df = spark.createDataFrame([(s,) for _, s in pairs], ["s"])
    got = [r["d"] for r in df.select(standardize_date("s").alias("d")).collect()]
    want = [d for d, _ in pairs]
    assert got == want


@given(
    st.lists(
        st.decimals(
            min_value=Decimal("-99999999.99"),
            max_value=Decimal("99999999.99"),
            places=2,
        ),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_parse_money_with_separators(spark, values):
    # format with thousands separators, parse back exactly
    strings = [f"{v:,.2f}" for v in values]
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = [r["m"] for r in df.select(parse_money("s").alias("m")).collect()]
    assert got == list(values)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # key
            st.integers(min_value=0, max_value=100),  # version
            st.integers(min_value=0, max_value=10**6),  # unique-ish payload
        ),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_dedup_rank_keeps_exact_winner(spark, rows):
    # unique tiebreaker: (version, payload, idx)
    data = [(k, v, p, i) for i, (k, v, p) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, v long, p long, idx long")
    out = dedup_rank(df, keys=["k"], order_by=["v", "p", "idx"], descending=True)
    got = {(r["k"], r["v"], r["p"], r["idx"]) for r in out.collect()}
    # reference implementation: max by (v, p, idx) per key
    want = set()
    by_key: dict[int, list] = {}
    for row in data:
        by_key.setdefault(row[0], []).append(row)
    for k, grp in by_key.items():
        want.add(max(grp, key=lambda r: (r[1], r[2], r[3])))
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # key
            st.integers(min_value=0, max_value=1000), # left ts
        ),
        min_size=1,
        max_size=15,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=0, max_value=99),
        ),
        min_size=0,
        max_size=15,
    ),
)
@SETTINGS
def test_asof_join_matches_reference(spark, lefts, rights):
    from datetime import datetime

    from etl_hiscox_spark.operators.joins import asof_join

    base = datetime(2024, 1, 1)
    # deduplicate right (k, ts) pairs so 'latest at ts' is unambiguous
    rmap = {}
    for k, ts, v in rights:
        rmap[(k, ts)] = v
    rights_u = [(k, ts, v) for (k, ts), v in rmap.items()]
    ldf = spark.createDataFrame(
        [(i, k, base + timedelta(seconds=ts)) for i, (k, ts) in enumerate(lefts)],
        "i long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, base + timedelta(seconds=ts), float(v)) for k, ts, v in rights_u],
        "k long, ts timestamp, v double",
    )
    out = {
        r["i"]: r["v_asof"]
        for r in asof_join(ldf, rdf, key="k", left_ts="ts", right_ts="ts", right_values=["v"]).collect()
    }
    for i, (k, lts) in enumerate(lefts):
        eligible = [(ts, v) for (kk, ts, v) in rights_u if kk == k and ts <= lts]
        want = max(eligible)[1] if eligible else None
        got = out[i]
        assert got == (float(want) if want is not None else None), (i, k, lts)


@given(st.lists(st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=15))
@SETTINGS
def test_exact_dedup_partitions_by_normalized_text(spark, texts):
    from etl_hiscox_spark.functions.text import normalize_text
    from etl_hiscox_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = exact_dedup(df, "text", "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    # reference: keep min id per normalized form
    norm = {}
    for i, t in enumerate(texts):
        key = " ".join(t.lower().strip().split())
        norm.setdefault(key, i)
    assert kept == sorted(norm.values())


def _chunk_reference(tokens: list[str], size: int, overlap: int) -> list[tuple[int, int, str]]:
    """Pure-Python chunking reference: (chunk_idx, n_tokens, text)."""
    toks = tokens if tokens else [""]
    stride = size - overlap
    bound = max(len(toks) - overlap, 1)
    out = []
    for idx, start in enumerate(range(0, bound, stride)):
        piece = toks[start : start + size]
        out.append((idx, len(piece), " ".join(piece)))
    return out


@SETTINGS
@given(
    st.integers(min_value=0, max_value=60),   # n tokens
    st.integers(min_value=1, max_value=12),   # chunk size
    st.data(),
)
def test_chunk_documents_matches_reference(spark, n, size, data):
    from etl_hiscox_spark.operators.chunking import chunk_documents

    overlap = data.draw(st.integers(min_value=0, max_value=size - 1))
    toks = [f"w{i}" for i in range(n)]
    df = spark.createDataFrame([("d", " ".join(toks))], ["doc_id", "text"])
    got = sorted(
        (r.chunk_idx, r.n_tokens, r.chunk_text)
        for r in chunk_documents(df, "text", "doc_id", size, overlap).collect()
    )
    want = sorted(_chunk_reference(toks, size, overlap))
    assert got == want
    # full coverage: every token appears in some chunk
    covered = {t for _, _, text in got for t in text.split(" ")}
    assert set(toks) <= covered or n == 0


@given(
    st.integers(min_value=1, max_value=3).flatmap(
        lambda ch: st.lists(
            st.lists(
                st.integers(min_value=-(2**15), max_value=2**15 - 1),
                min_size=ch,
                max_size=ch,
            ),
            min_size=0,
            max_size=64,
        )
    ),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(deadline=None, max_examples=40)
def test_wav_codec_roundtrip_property(samples, rate):
    """encode_wav∘decode_wav is the identity for ANY PCM16 payload —
    every channel count, sample value (incl. int16 extremes), length
    (incl. empty), and sample rate."""
    import numpy as np

    from etl_hiscox_spark.operators.multimodal import decode_wav, encode_wav

    if samples:
        arr = np.asarray(samples, dtype=np.int16)
    else:
        arr = np.zeros((0, 1), dtype=np.int16)
    dec, r = decode_wav(encode_wav(arr, rate))
    assert r == rate
    assert dec.shape == arr.shape and np.array_equal(dec, arr)


@given(
    st.lists(  # batches of (month 1-6, id, amount); months arrive roughly in order
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=6),
                st.integers(min_value=0, max_value=99),
                st.floats(min_value=0, max_value=100, allow_nan=False),
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=3,
    )
)
@SETTINGS
def test_incremental_refresh_equals_full_rebuild(spark, tmp_path_factory, batches):
    """Property: running incremental_refresh over a growing source — where
    each run sees everything that has arrived so far — ends at exactly the
    state a from-scratch aggregation of the final source produces,
    regardless of how rows are distributed over months and batches. (Late
    rows for pre-watermark months are out of contract; dbt's incremental
    models share the boundary-partition-only guarantee.)"""
    from etl_hiscox_spark.sources.writers import incremental_refresh

    path = str(tmp_path_factory.mktemp("incr") / "t")
    # arrival contract: time moves forward — re-chunk the drawn rows in
    # month order so no batch introduces a month older than the watermark
    # (a month may still straddle a batch boundary: that's the late-row-
    # in-boundary-partition case the >= watermark rule exists for)
    ordered = sorted((r for b in batches for r in b), key=lambda r: r[0])
    sizes = [len(b) for b in batches]
    chunks, pos = [], 0
    for s in sizes:
        chunks.append(ordered[pos : pos + s])
        pos += s
    seen: list[tuple[int, int, float]] = []
    for chunk in chunks:
        seen.extend(chunk)
        agg_src = (
            spark.createDataFrame(seen, "month int, id int, amount double")
            .groupBy("month")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("total"))
        )
        incremental_refresh(spark, agg_src, path, "month")

    got = {
        r["month"]: (r["n"], round(r["total"], 6))
        for r in spark.read.parquet(path).collect()
    }
    from collections import defaultdict

    exp: dict[int, list[float]] = defaultdict(list)
    for m, _, a in seen:
        exp[m].append(a)
    expected = {m: (len(v), round(sum(v), 6)) for m, v in exp.items()}
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=20),  # day offset
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_resample_ffill_matches_python_reference(spark, rows):
    """Property: the grid/ffill operator equals a plain-Python reference on
    arbitrary sparse per-key observations."""
    from datetime import datetime, timedelta

    from etl_hiscox_spark.operators.timeseries import resample_ffill

    base = datetime(2024, 3, 1)
    data = [(k, base + timedelta(days=d, hours=1), v) for k, d, v in rows]
    df = spark.createDataFrame(data, "k string, ts timestamp, v double")
    out = resample_ffill(df, ["k"], "ts", F.col("v"), grain="day", interval="1 day")
    got = {(r["k"], str(r["bucket"])[:10]): (round(r["value"], 6), r["is_gap"]) for r in out.collect()}

    # python reference
    from collections import defaultdict

    daily: dict[str, dict[int, float]] = defaultdict(lambda: defaultdict(float))
    for k, d, v in rows:
        daily[k][d] += v
    expected = {}
    for k, days in daily.items():
        lo, hi = min(days), max(days)
        last = None
        for d in range(lo, hi + 1):
            if d in days:
                last = days[d]
                expected[(k, str((base + timedelta(days=d)).date()))] = (round(last, 6), False)
            else:
                expected[(k, str((base + timedelta(days=d)).date()))] = (round(last, 6), True)
    assert got == expected
