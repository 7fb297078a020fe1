"""Property-based cross-engine fuzz of the query-DSL template compiler.

Same oracle method as the ES|QL fuzz (test_property_esql.py): each
strategy draw emits a (query-DSL JSON clause, DuckDB WHERE fragment)
pair from one pool, random bool trees compose them (must=AND,
should-only=OR, must_not=NOT), and the compiled Spark filter must
select exactly the same id multiset as the SQL predicate.

NULL three-valued logic is part of the contract: `grp` carries NULLs,
so negated and OR-composed clauses exercise the NULL-dropping
semantics both engines share (a NULL predicate never selects the row).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from logstash_filter_elasticsearch_spark.plans.template import (
    compile_template,
    to_column,
)

N_ROWS = 150


def _base_pdf() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    words = ["delta", "echo", "dart", "foxtrot", "drum", "lima"]
    return pd.DataFrame(
        {
            "id": np.arange(N_ROWS, dtype=np.int64),
            "n": rng.integers(0, 100, N_ROWS).astype(np.int64),
            "val": np.round(rng.uniform(-50, 50, N_ROWS), 2),
            "grp": rng.choice(["a", "b", "c", None], N_ROWS).tolist(),
            "txt": [
                f"{rng.choice(words)} {rng.choice(words)}"
                f"{int(rng.integers(0, 30))}"
                for _ in range(N_ROWS)
            ],
        }
    )


@pytest.fixture(scope="module")
def engines(spark):
    pdf = _base_pdf()
    sdf = spark.createDataFrame(
        pdf, "id long, n long, val double, grp string, txt string"
    )
    sdf = sdf.cache()
    sdf.count()
    con = duckdb.connect()
    con.register("t", pdf)
    yield sdf, con
    con.close()
    sdf.unpersist()


# (query-DSL clause, DuckDB WHERE fragment) — the translation is
# derived pairwise, not re-implemented
_TOKENS = (
    "list_filter(string_split_regex(lower(txt), '[^a-z0-9]+'), "
    "x -> x <> '')"
)
LEAVES = [
    ({"term": {"grp": "a"}}, "grp = 'a'"),
    ({"term": {"n": 42}}, "n = 42"),
    ({"terms": {"grp": ["a", "c"]}}, "grp IN ('a', 'c')"),
    ({"range": {"val": {"gte": -10, "lt": 25}}}, "val >= -10 AND val < 25"),
    ({"range": {"n": {"gt": 50}}}, "n > 50"),
    ({"exists": {"field": "grp"}}, "grp IS NOT NULL"),
    ({"prefix": {"txt": "d"}}, "txt LIKE 'd%'"),
    ({"wildcard": {"txt": "d*3"}}, "txt LIKE 'd%3'"),
    ({"regexp": {"txt": "d.* .*"}}, "regexp_full_match(txt, 'd.* .*')"),
    (
        {"match": {"txt": "delta echo"}},
        f"list_has_any({_TOKENS}, ['delta', 'echo'])",
    ),
    (
        {"match": {"txt": {"query": "delta echo", "operator": "and"}}},
        f"list_has_all({_TOKENS}, ['delta', 'echo'])",
    ),
    (
        {"match_phrase": {"txt": "delta echo"}},
        f"contains(' ' || array_to_string({_TOKENS}, ' ') || ' ', "
        f"' delta echo ')",
    ),
    # r5 query_string grammar breadth, through the full JSON-DSL path:
    # field groups distribute the field; _exists_; fuzzy -> levenshtein
    # (same AUTO edit count spelled on the SQL side); boost stripped;
    # \-escape resolves to a literal space inside the term
    (
        {"query_string": {"query": "grp:(a OR c)", "default_operator": "AND"}},
        "(grp = 'a' OR grp = 'c')",
    ),
    (
        {"query_string": {"query": "_exists_:grp AND n:>=50"}},
        "(grp IS NOT NULL AND n >= 50)",
    ),
    (
        {"query_string": {"query": "grp:a^2 OR n:[90 TO 95}"}},
        "(grp = 'a' OR (n >= 90 AND n < 95))",
    ),
    (
        {"query_string": {"query": "txt:dart~1"}},
        "levenshtein(txt, 'dart') <= 1",
    ),
    (
        {"query_string": {"query": r"txt:delta\ echo3"}},
        "txt = 'delta echo3'",
    ),
]


@st.composite
def clause_pairs(draw, depth: int = 2):
    """One random (query-DSL node, SQL predicate) pair."""
    if depth == 0 or draw(st.booleans()):
        return draw(st.sampled_from(LEAVES))
    kind = draw(st.sampled_from(["must", "should", "must_not", "mixed"]))
    children = draw(
        st.lists(clause_pairs(depth=depth - 1), min_size=1, max_size=3)
    )
    if kind == "must":
        node = {"bool": {"must": [c[0] for c in children]}}
        sql = " AND ".join(f"({c[1]})" for c in children)
    elif kind == "should":
        # should with no must/filter: minimum_should_match defaults to 1
        node = {"bool": {"should": [c[0] for c in children]}}
        sql = " OR ".join(f"({c[1]})" for c in children)
    elif kind == "must_not":
        node = {"bool": {"must_not": [c[0] for c in children]}}
        sql = " AND ".join(f"(NOT ({c[1]}))" for c in children)
    else:  # must + must_not in one bool
        pos, neg = children[0], children[-1]
        node = {"bool": {"must": [pos[0]], "must_not": [neg[0]]}}
        sql = f"({pos[1]}) AND (NOT ({neg[1]}))"
    return node, sql


@settings(
    max_examples=100,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(clause_pairs())
def test_random_template_matches_duckdb(engines, pair):
    sdf, con = engines
    node, sql = pair
    compiled = compile_template({"query": node})
    cond = None
    for c in compiled.conjuncts():
        col = to_column(c, F.col)
        cond = col if cond is None else (cond & col)
    got = sorted(
        r["id"] for r in sdf.filter(cond).select("id").collect()
    )
    want = sorted(
        r[0] for r in con.sql(f"SELECT id FROM t WHERE {sql}").fetchall()
    )
    assert got == want, f"diverge for {node}\nSQL: {sql}"
