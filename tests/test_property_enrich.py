"""Property-based tests: the Enricher vs a pure-Python oracle.

The reference pins merge behavior with example-based specs
(elasticsearch_dsl_spec.rb). Here hypothesis generates random
event/lookup tables and enrichment configs, and a straightforward
Python model recomputes every rule: left-outer pass-through, sort +
result_size top-k, fields/docinfo copies, full-group aggregations,
total_hits, and matched gating. Any divergence between the DataFrame
program and the model is a bug in one of them.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from logstash_filter_elasticsearch_spark.operators.enrich import EnrichSpec, Enricher

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.integers(min_value=-100, max_value=100)


@st.composite
def tables(draw):
    events = draw(
        st.lists(
            st.tuples(st.integers(0, 10_000), KEYS), min_size=1, max_size=12, unique_by=lambda t: t[0]
        )
    )
    lookup = draw(
        st.lists(st.tuples(KEYS, VALS, VALS), min_size=0, max_size=15)
    )
    size = draw(st.integers(min_value=0, max_value=4))
    direction = draw(st.sampled_from(["asc", "desc"]))
    return events, lookup, size, direction


def py_oracle(events, lookup, size, direction):
    """Reference model of the merge (dsl_executor.rb:28-91 in set form)."""
    out = {}
    for eid, key in events:
        hits = [(s, v) for (k, s, v) in lookup if k == key]
        total = len(hits)
        # deterministic total order: sort key then value (ties broken)
        hits.sort(key=lambda h: (h[0], h[1]), reverse=(direction == "desc"))
        top = hits[:size] if size > 0 else []
        out[eid] = {
            "total_hits": total,
            "vals": [v for (_, v) in top] if size > 0 else None,
            "agg_sum": sum(v for (_, v) in hits) if hits else None,
            "matched": total > 0,
        }
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=tables())
def test_enricher_matches_python_model(spark, data):
    events, lookup, size, direction = data
    edf = spark.createDataFrame(events, "event_id long, user_key long")
    ldf = spark.createDataFrame(lookup, "k long, sort_val long, payload_val long")

    spec = EnrichSpec(
        event_key="user_key",
        lookup_key="k",
        fields={"payload_val": "vals"},
        aggregation_fields={"agg_sum": ("sum", "payload_val")},
        result_size=size,
        # two-level sort = a total order, so top-k is deterministic
        sort=[("sort_val", direction), ("payload_val", direction)],
    )
    got = {
        r["event_id"]: r
        for r in Enricher(spec).apply(edf, ldf).collect()
    }
    exp = py_oracle(events, lookup, size, direction)

    assert set(got) == set(exp)
    for eid, e in exp.items():
        g = got[eid]
        assert g["_meta_total_hits"] == e["total_hits"], (eid, "total_hits")
        assert bool(g["matched"]) == e["matched"], (eid, "matched")
        got_vals = g["vals"] if size > 0 else None
        assert (got_vals or None) == (e["vals"] or None), (eid, "vals")
        if e["agg_sum"] is None:
            assert g["agg_sum"] is None
        else:
            assert g["agg_sum"] == e["agg_sum"], (eid, "agg_sum")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab é"), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_shingles_match_python_model(spark, texts, n):
    """Regex shingle extraction == the plain-Python definition."""
    from logstash_filter_elasticsearch_spark.operators.dedup import (
        with_word_shingles,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r["id"]: sorted(r["sh"])
        for r in with_word_shingles(df, "text", n, "sh").collect()
    }
    for i, t in enumerate(texts):
        words = t.split()
        if len(words) >= n:
            exp = sorted({" ".join(words[j : j + n]) for j in range(len(words) - n + 1)})
        else:
            exp = [" ".join(words)]
        assert got[i] == exp, (i, t)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50), st.integers(0, 10_000)),
        min_size=1,
        max_size=20,
    )
)
def test_salted_dedup_first_matches_model(spark, rows):
    """Two-phase salted dedup == plain 'first row per key under the
    total order' regardless of partitioning."""
    from logstash_filter_elasticsearch_spark.operators.aggregate import (
        salted_dedup_first,
    )

    df = spark.createDataFrame(
        rows, "key int, ord_val int, uid int"
    ).repartition(5)
    got = {
        r["key"]: (r["ord_val"], r["uid"])
        for r in salted_dedup_first(
            df, "key", [F.col("ord_val"), F.col("uid")], salt_buckets=4
        ).collect()
    }
    exp = {}
    for k, o, u in sorted(rows, key=lambda r: (r[1], r[2])):
        exp.setdefault(k, (o, u))
    assert got == exp


# ---- ES|QL lexer fuzz: literals must survive translation untouched ----

_LIT_CHARS = st.lists(
    st.sampled_from(
        list("abcXYZ 0123456789") + ["==", "?p", "|", ",", "(", ")", "BY",
                                     "WHERE", "\\\\", '\\"', "\\'"]
    ),
    min_size=0,
    max_size=8,
).map("".join)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(lit=_LIT_CHARS, mode=st.sampled_from(["where", "stats", "eval"]))
def test_esql_literal_survives_translation(spark, lit, mode):
    """Any string literal — containing operators, pipes, commas,
    keywords, escaped quotes — must pass through the quote-aware
    scanners byte-identically: the compiled query compares equal to the
    same comparison done in Python."""
    from logstash_filter_elasticsearch_spark.plans.esql import run_esql

    # render as a double-quoted ES|QL literal; backslash sequences in
    # _LIT_CHARS are already escape-shaped
    rendered = '"' + lit + '"'
    try:
        expected_literal = (
            lit.replace("\\\\", "\x00").replace('\\"', '"')
            .replace("\\'", "'").replace("\x00", "\\")
        )
    except Exception:
        return
    df = spark.createDataFrame(
        [(expected_literal,), ("something-else",)], "note string"
    )
    if mode == "where":
        out = run_esql(
            spark, f"FROM t | WHERE note == {rendered}", tables={"t": df}
        ).collect()
        assert [r["note"] for r in out] == [expected_literal]
    elif mode == "stats":
        out = run_esql(
            spark,
            f"FROM t | STATS n = count(*) WHERE note == {rendered}",
            tables={"t": df},
        ).collect()
        assert out[0]["n"] == 1
    else:
        out = run_esql(
            spark, f"FROM t | EVAL copy = {rendered} | LIMIT 1",
            tables={"t": df},
        ).collect()
        assert out[0]["copy"] == expected_literal
