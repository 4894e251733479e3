"""Property-based tests (hypothesis): the operators whose semantics have
edge cases a fixed fixture can miss, checked against independent pure-Python
reference implementations on generated data.

- as-of join: tie timestamps, missing keys, empty right sides;
- salted aggregation: must be *invisible* (≡ plain groupBy) for any data,
  not just the benchmark fixture;
- shingling: boundary document lengths around k.

Example counts stay small — each example builds Spark DataFrames — but the
generators hit the boundaries deliberately (ties via tiny value domains).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.skew import salted_sum_count
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.text import (
    shingles_col,
    tokens_col,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import asof_join

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# tiny domains force key collisions and timestamp ties
KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=8)


@given(
    left=st.lists(st.tuples(KEYS, TS), max_size=12),
    right=st.lists(st.tuples(KEYS, TS), max_size=12),
)
@SETTINGS
def test_asof_join_matches_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)] or [(None, None, None)],
        "k long, ts long, row_id long",
    ).filter(F.col("row_id").isNotNull())
    rdf = spark.createDataFrame(
        right or [(None, None)], "k long, ts long"
    ).filter(F.col("k").isNotNull())

    got = {
        r["row_id"]: r["asof_ts"]
        for r in asof_join(ldf, rdf, key="k", asof_col="asof_ts").collect()
    }
    want = {
        i: max((rt for rk, rt in right if rk == k and rt <= t), default=None)
        for i, (k, t) in enumerate(left)
    }
    assert got == want


@given(rows=st.lists(st.tuples(KEYS, st.integers(min_value=-1000, max_value=1000)), max_size=20))
@SETTINGS
def test_salted_aggregation_is_invisible(spark, rows):
    df = spark.createDataFrame(
        rows or [(None, None)], "k long, v long"
    ).filter(F.col("k").isNotNull()).withColumn("v", F.col("v").cast("double"))
    salted = {
        r["k"]: (r["trip_count"], r["total_value"])
        for r in salted_sum_count(df, ["k"], "v").collect()
    }
    plain = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"))
        .collect()
    }
    assert salted == plain


@given(words=st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=6))
@SETTINGS
def test_shingles_match_reference(spark, words):
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(shingles_col(tokens_col("text"), 3).alias("sh")).collect()[0]["sh"]
    toks = text.split(" ") if text else [""]
    want = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)] if len(toks) >= 3 else []
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "cc", "dd", "eee"]), min_size=1, max_size=12),
        min_size=1,
        max_size=5,
    )
)
@SETTINGS
def test_cdc_chunks_partition_any_token_stream(spark, docs):
    """For ANY token stream: chunks reconstruct the document exactly, chunk
    token counts sum to the document length, and chunk boundaries are
    content-determined (first hex digit of md5(token) == '0')."""
    import hashlib

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
        cdc_chunks,
    )

    toked = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)], "doc_id long, toks array<string>"
    )
    rows = cdc_chunks(toked).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for i, toks in enumerate(docs):
        chunks = sorted(per_doc[i], key=lambda r: r["chunk_id"])
        assert " ".join(c["chunk_text"] for c in chunks) == " ".join(toks)
        assert sum(c["n_toks"] for c in chunks) == len(toks)
        # reference chunking: boundary iff md5(tok) starts with '0'
        want_n_chunks = len(
            {sum(1 for t in toks[: j + 1] if hashlib.md5(t.encode()).hexdigest()[0] == "0")
             for j in range(len(toks))}
        )
        assert len(chunks) == want_n_chunks
