"""Property-based cross-engine fuzz of the ES|QL pipe compiler.

The contract gate checks ~20 hand-written pipelines against DuckDB;
this suite generates random small pipelines (WHERE / EVAL / STATS /
KEEP / SORT / LIMIT over one seeded table) TOGETHER WITH their
mechanically-paired DuckDB translation and asserts result equality —
the same oracle method as the driver gate, automated over the
combinatorial space. Each strategy draw emits (esql_fragment,
sql_fragment) pairs from one pool, so the translation is derived, not
re-implemented.

Known dialect deltas are encoded in the SQL side of each pair, which
is exactly the point — e.g. ES|QL SORT default null placement (ASC ->
NULLS LAST, DESC -> NULLS FIRST) is spelled explicitly in the ORDER
BY, and DuckDB's null-skipping concat() is avoided in favor of the
null-propagating || that matches Spark's concat.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logstash_filter_elasticsearch_spark.plans.esql import run_esql

N_ROWS = 120


def _base_pdf() -> pd.DataFrame:
    rng = np.random.default_rng(2024)
    val = np.round(rng.uniform(-50, 50, N_ROWS), 2)
    val_null = rng.random(N_ROWS) < 0.15
    grp = rng.choice(["a", "b", "c", "d", None], N_ROWS).tolist()
    words = ["delta", "echo", "dart", "foxtrot", "drum", "lima"]
    return pd.DataFrame(
        {
            "id": np.arange(N_ROWS, dtype=np.int64),
            "n": rng.integers(0, 100, N_ROWS).astype(np.int64),
            "val": [None if m else float(v) for m, v in zip(val_null, val)],
            "grp": grp,
            "txt": [
                f"{rng.choice(words)}{int(rng.integers(0, 30))}"
                for _ in range(N_ROWS)
            ],
        }
    )


@pytest.fixture(scope="module")
def engines(spark):
    pdf = _base_pdf()
    sdf = spark.createDataFrame(pdf, "id long, n long, val double, grp string, txt string")
    sdf = sdf.cache()
    sdf.count()
    con = duckdb.connect()
    con.register("t", pdf)
    yield sdf, con
    con.close()
    sdf.unpersist()


WHERES = [
    ("val > 10.0", "val > 10.0"),
    ("n % 3 == 0", "n % 3 = 0"),
    ("grp == 'a' OR n > 80", "grp = 'a' OR n > 80"),
    # ES|QL LIKE wildcard is *, SQL's is % — the pair encodes the dialect gap
    ("txt LIKE 'd*'", "txt LIKE 'd%'"),
    # pattern lists (8.16+) = any-of; RLIKE anchors the whole string
    ("txt LIKE ('d*', 'e*')", "(txt LIKE 'd%' OR txt LIKE 'e%')"),
    ("NOT txt LIKE ('d*', 'e*')", "NOT (txt LIKE 'd%' OR txt LIKE 'e%')"),
    ("txt RLIKE 'd.*'", "regexp_full_match(txt, 'd.*')"),
    ("NOT (n >= 40) AND val IS NOT NULL", "NOT (n >= 40) AND val IS NOT NULL"),
    ("n > 10 AND n < 90", "n > 10 AND n < 90"),
]

EVALS = [
    ("e = n * 2 + 1", "n * 2 + 1 AS e"),
    ("e = CASE(val > 5.0, 1, 0)", "CASE WHEN val > 5.0 THEN 1 ELSE 0 END AS e"),
    ("e = CASE(n % 2 == 0, n)", "CASE WHEN n % 2 = 0 THEN n END AS e"),
    ("e = ABS(n - 42)", "abs(n - 42) AS e"),
    # || propagates NULL like Spark concat (DuckDB concat() skips NULLs)
    ("e = CONCAT(grp, '_x')", "(grp || '_x') AS e"),
    ("e = TO_UPPER(txt)", "upper(txt) AS e"),
    # zero divisors occur (n % 7 == 0 rows): both engines must null,
    # exercising the try_divide/try_mod rewrite incl. precedence.
    # int/int division is ES|QL TRUNCATING division — paired with
    # DuckDB's // (also truncate-toward-zero, NULL on zero), NOT its
    # float /: the pair is the oracle for the type-aware div emission
    ("e = n / (n % 7)", "n // (n % 7) AS e"),
    # negative dividends: truncation toward zero, not floor
    ("e = (n - 50) / 3", "(n - 50) // 3 AS e"),
    # int / float stays float division on both sides
    ("e = n / (val + 100.0)", "n / (val + 100.0) AS e"),
    ("e = n + n % (n % 5) * 2", "n + n % (n % 5) * 2 AS e"),
    # hash/base64 scalars: deterministic strings, engine-portable
    ("e = HASH('md5', txt)", "md5(txt) AS e"),
    ("e = TO_BASE64(txt)", "to_base64(txt::BLOB) AS e"),
    # IP_PREFIX fragments (r5): the SQL side replays the
    # num - num % 2^(32-len) arithmetic on the synthesized octets —
    # /20 masks inside the third octet (n in 0..99), /28 inside the
    # fourth (7 -> 0), /32 is identity
    ("e = IP_PREFIX(CONCAT('10.0.', TO_STRING(n), '.7'), 20, 64)",
     "('10.0.' || (n - n % 16) || '.0') AS e"),
    ("e = IP_PREFIX(CONCAT('10.0.', TO_STRING(n), '.7'), 28, 64)",
     "('10.0.' || n || '.0') AS e"),
    ("e = IP_PREFIX(CONCAT('10.0.', TO_STRING(n), '.7'), 32, 64)",
     "('10.0.' || n || '.7') AS e"),
    # math tail (r5): oracle replays Java's exact op order so doubles
    # stay bit-identical (toDegrees = x*180/pi, toRadians = x/180*pi,
    # scalb = x*2^i); ROUND_TO returns the literal points themselves
    ("e = TO_DEGREES(TO_DOUBLE(n % 360))",
     "(CAST(n % 360 AS DOUBLE) * 180.0 / pi()) AS e"),
    ("e = TO_RADIANS(TO_DOUBLE(n % 360))",
     "(CAST(n % 360 AS DOUBLE) / 180.0 * pi()) AS e"),
    ("e = SCALB(TO_DOUBLE(n % 9), 4)",
     "(CAST(n % 9 AS DOUBLE) * power(CAST(2 AS DOUBLE), 4)) AS e"),
    ("e = TAU() * TO_DOUBLE(n % 3)",
     "(2 * pi()) * CAST(n % 3 AS DOUBLE) AS e"),
    ("e = ROUND_TO(n, 0, 25, 50, 75)",
     "CASE WHEN n IS NULL THEN NULL WHEN n >= 75 THEN 75 "
     "WHEN n >= 50 THEN 50 WHEN n >= 25 THEN 25 ELSE 0 END AS e"),
    # `::` cast shorthand (r5): routed through TO_* so malformed input
    # NULLs instead of aborting — paired with DuckDB TRY_CAST
    ("e = TO_STRING(n)::long + 1", "n + 1 AS e"),
    ("e = SUBSTRING(txt, 1, 2)::long",
     "TRY_CAST(substring(txt, 1, 2) AS BIGINT) AS e"),
    ("e = (n % 10)::double / 4", "CAST(n % 10 AS DOUBLE) / 4 AS e"),
]

# FUSE (r5): branch predicate pool for FORK -> STATS -> FUSE pipelines
FUSE_BRANCHES = [
    ("WHERE grp == 'a'", "WHERE grp = 'a'"),
    ("WHERE n > 60", "WHERE n > 60"),
    ("WHERE n % 2 == 0", "WHERE n % 2 = 0"),
    ("WHERE val > 0.0", "WHERE val > 0.0"),
    ("WHERE txt LIKE 'd*'", "WHERE txt LIKE 'd%'"),
]

# DISSECT modifier pool (r5): the line is synthesized from columns, so
# the SQL side states the extracted fields directly (null-guarded: a
# NULL grp nulls the whole line, and dissect of NULL yields NULLs).
# Line shape: txt || ' ' || n || ' - ' || grp || '   tail'
DISSECTS = [
    # plain split on the literal separators
    ('"%{a} %{b} - %{c}   tail"', None,
     ["CASE WHEN grp IS NOT NULL THEN txt END AS a",
      "CASE WHEN grp IS NOT NULL THEN CAST(n AS VARCHAR) END AS b",
      "CASE WHEN grp IS NOT NULL THEN grp END AS c"],
     ["a", "b", "c"]),
    # %{+key} append with APPEND_SEPARATOR + named skip %{?x}
    ('"%{+a} %{+a} - %{?x}   tail"', "_",
     ["CASE WHEN grp IS NOT NULL THEN txt || '_' || CAST(n AS VARCHAR) "
      "END AS a"],
     ["a"]),
    # %{key->} right padding: the single-space delimiter after c may
    # repeat, eating the padding run before 'tail'
    ('"%{a} %{b} - %{c->} %{d}"', None,
     ["CASE WHEN grp IS NOT NULL THEN txt END AS a",
      "CASE WHEN grp IS NOT NULL THEN CAST(n AS VARCHAR) END AS b",
      "CASE WHEN grp IS NOT NULL THEN grp END AS c",
      "CASE WHEN grp IS NOT NULL THEN 'tail' END AS d"],
     ["a", "b", "c", "d"]),
]

AGGS = [
    ("s", "SUM(n)", "CAST(sum(n) AS BIGINT) AS s"),
    ("c", "COUNT(*)", "count(*) AS c"),
    ("mx", "MAX(val)", "max(val) AS mx"),
    ("av", "AVG(val)", "avg(val) AS av"),
    ("mn", "MIN(n)", "CAST(min(n) AS BIGINT) AS mn"),
    # per-aggregate WHERE -> SQL FILTER clause on both engines
    ("sw", "SUM(n) WHERE n > 50", "CAST(sum(n) FILTER (WHERE n > 50) AS BIGINT) AS sw"),
    ("cw", "COUNT(*) WHERE grp == 'a'", "count(*) FILTER (WHERE grp = 'a') AS cw"),
    # median = selection + midpoint interpolation: order-insensitive,
    # so the float column is safe (unlike summation-order-sensitive
    # float sums — see cross-engine pitfalls)
    ("md", "MEDIAN(val)", "quantile_cont(val, 0.5) AS md"),
    # integral products sum exactly in any order; division operands are
    # then bit-identical across engines
    ("wa", "WEIGHTED_AVG(n, (n % 5) + 1)",
     "sum(CAST(n AS DOUBLE) * ((n % 5) + 1)) / sum((n % 5) + 1) AS wa"),
]

# window-form pairs for INLINESTATS: integer aggregates only — integer
# sums are exact in any order, while float window sums can ulp-diverge
# from the broadcast-join-back computation
INLINE_AGGS = [
    ("s", "SUM(n)", "CAST(sum(n) OVER ({win}) AS BIGINT)"),
    ("c", "COUNT(*)", "count(*) OVER ({win})"),
    ("mx", "MAX(n)", "CAST(max(n) OVER ({win}) AS BIGINT)"),
    ("mn", "MIN(n)", "CAST(min(n) OVER ({win}) AS BIGINT)"),
]

ROW_SORT_COLS = ["n", "val", "id"]


@st.composite
def pipeline_pairs(draw):
    """One random pipeline as (esql_statement, duckdb_sql, ordered)."""
    where = draw(st.one_of(st.none(), st.sampled_from(WHERES)))
    ev = draw(st.one_of(st.none(), st.sampled_from(EVALS)))
    mode = draw(st.sampled_from(["stats", "rows", "inline", "fuse", "dissect"]))

    if mode == "fuse":
        b1, b2 = draw(
            st.lists(st.sampled_from(FUSE_BRANCHES), min_size=2, max_size=2,
                     unique=True)
        )
        method = draw(st.sampled_from(["rrf", "linear"]))
        rc = draw(st.sampled_from([None, 10, 100])) if method == "rrf" else None
        opt = f" WITH rank_constant={rc}" if rc else ""
        esql_stmt = (
            f"FROM t | EVAL k = n % 10 "
            f"| FORK ({b1[0]} | STATS sc = COUNT(*) BY k) "
            f"       ({b2[0]} | STATS sc = COUNT(*) BY k) "
            f"| FUSE {method} KEY BY k SCORE BY sc{opt}"
        )
        if method == "rrf":
            contrib = f"1.0 / ({rc or 60} + row_number() OVER " \
                      f"(PARTITION BY f ORDER BY sc DESC, k ASC))"
        else:
            contrib = "sc"
        fused = "sum(contrib)" if method == "rrf" else \
            "CAST(sum(contrib) AS BIGINT)"
        sql = (
            f"WITH base AS (SELECT *, n % 10 AS k FROM t), "
            f"b1 AS (SELECT k, count(*) AS sc FROM base {b1[1]} GROUP BY k), "
            f"b2 AS (SELECT k, count(*) AS sc FROM base {b2[1]} GROUP BY k), "
            f"u AS (SELECT 0 AS f, k, sc FROM b1 "
            f"      UNION ALL SELECT 1, k, sc FROM b2), "
            f"r AS (SELECT k, {contrib} AS contrib FROM u) "
            f"SELECT k, {fused} AS _fused_score FROM r GROUP BY k "
            f"ORDER BY _fused_score DESC, k ASC"
        )
        return esql_stmt, sql, True

    if mode == "dissect":
        pat, sep, sql_fields, outs = draw(st.sampled_from(DISSECTS))
        sep_opt = f' APPEND_SEPARATOR="{sep}"' if sep else ""
        esql_stmt = (
            "FROM t | EVAL line = CONCAT(txt, ' ', TO_STRING(n), ' - ', "
            "grp, '   tail') "
            f"| DISSECT line {pat}{sep_opt} "
            f"| KEEP id, {', '.join(outs)} | SORT id"
        )
        sql = (
            f"SELECT id, {', '.join(sql_fields)} FROM t ORDER BY id"
        )
        return esql_stmt, sql, True

    esql = ["FROM t"]
    if where:
        esql.append(f"WHERE {where[0]}")
    if ev:
        esql.append(f"EVAL {ev[0]}")
    where_sql = f"WHERE {where[1]}" if where else ""
    base_cols = "id, n, val, grp, txt" + (f", {ev[1]}" if ev else "")
    inner = f"SELECT {base_cols} FROM t {where_sql}"

    if mode == "inline":
        aggs = draw(
            st.lists(st.sampled_from(INLINE_AGGS), min_size=1, max_size=2, unique=True)
        )
        by = draw(st.booleans())
        win = "PARTITION BY grp" if by else ""
        esql_aggs = ", ".join(f"{a[0]} = {a[1]}" for a in aggs)
        sql_aggs = ", ".join(
            f"{a[2].format(win=win)} AS {a[0]}" for a in aggs
        )
        esql.append(f"INLINESTATS {esql_aggs}" + (" BY grp" if by else ""))
        # SQL PARTITION BY groups NULLs together, same as the engine's
        # eqNullSafe join-back
        sql = f"SELECT *, {sql_aggs} FROM ({inner})"
        ordered = draw(st.booleans())
        if ordered:
            esql.append("SORT id")
            sql = f"SELECT * FROM ({sql}) ORDER BY id"
            limit = draw(st.one_of(st.none(), st.integers(1, 10)))
            if limit:
                esql.append(f"LIMIT {limit}")
                sql += f" LIMIT {limit}"
        return " | ".join(esql), sql, ordered

    if mode == "stats":
        aggs = draw(
            st.lists(st.sampled_from(AGGS), min_size=1, max_size=3, unique=True)
        )
        by = draw(st.sampled_from([None, "grp", "bucket"]))
        esql_aggs = ", ".join(f"{a[0]} = {a[1]}" for a in aggs)
        sql_aggs = ", ".join(a[2] for a in aggs)
        if by == "grp":
            esql.append(f"STATS {esql_aggs} BY grp")
            sql = f"SELECT grp, {sql_aggs} FROM ({inner}) GROUP BY grp"
            sort_col = "grp"
        elif by == "bucket":
            # computed group key through the same BUCKET compilation
            esql.append(f"STATS {esql_aggs} BY b = BUCKET(n, 10)")
            sql = (
                f"SELECT floor(n / (10)) * (10) AS b, {sql_aggs} "
                f"FROM ({inner}) GROUP BY 1"
            )
            sort_col = "b"
        else:
            esql.append(f"STATS {esql_aggs}")
            sql = f"SELECT {sql_aggs} FROM ({inner})"
            sort_col = None
        ordered = sort_col is not None and draw(st.booleans())
        if ordered:
            desc = draw(st.booleans())
            dir_esql = "DESC" if desc else ""
            # ES|QL default null placement, spelled out for DuckDB
            dir_sql = "DESC NULLS FIRST" if desc else "ASC NULLS LAST"
            esql.append(f"SORT {sort_col} {dir_esql}")
            sql = f"SELECT * FROM ({sql}) ORDER BY {sort_col} {dir_sql}"
            limit = draw(st.one_of(st.none(), st.integers(1, 4)))
            if limit:
                esql.append(f"LIMIT {limit}")
                sql += f" LIMIT {limit}"
        return " | ".join(esql), sql, ordered

    keep = draw(st.booleans())
    cols = "id, n, val" + (", e" if ev else "")
    if keep:
        esql.append(f"KEEP {cols}")
        sql = f"SELECT {cols} FROM ({inner})"
    else:
        sql = inner
    ordered = draw(st.booleans())
    if ordered:
        col = draw(st.sampled_from(ROW_SORT_COLS))
        desc = draw(st.booleans())
        # explicit NULLS FIRST/LAST override vs the ES|QL default
        nulls = draw(st.sampled_from([None, "FIRST", "LAST"]))
        dir_esql = "DESC" if desc else ""
        if nulls:
            dir_esql = f"{dir_esql} NULLS {nulls}".strip()
            dir_sql = f"{'DESC' if desc else 'ASC'} NULLS {nulls}"
        else:
            dir_sql = "DESC NULLS FIRST" if desc else "ASC NULLS LAST"
        # id tiebreak makes SORT+LIMIT deterministic across engines
        esql.append(f"SORT {col} {dir_esql}, id")
        sql = f"SELECT * FROM ({sql}) ORDER BY {col} {dir_sql}, id"
        limit = draw(st.one_of(st.none(), st.integers(1, 10)))
        if limit:
            esql.append(f"LIMIT {limit}")
            sql += f" LIMIT {limit}"
    return " | ".join(esql), sql, ordered


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # integral floats -> int: BUCKET keys come back BIGINT from
        # Spark's floor but DOUBLE from DuckDB's
        if f.is_integer():
            return int(f)
        return round(f, 6)
    if isinstance(v, (np.integer, int)):
        return int(v)
    return v


def _frame_rows(pdf: pd.DataFrame, ordered: bool):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    if not ordered:
        rows.sort(key=repr)
    return cols, rows


@settings(
    max_examples=120,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(pipeline_pairs())
def test_random_pipeline_matches_duckdb(engines, pair):
    sdf, con = engines
    esql, sql, ordered = pair
    spark_pdf = run_esql(sdf.sparkSession, esql, tables={"t": sdf}).toPandas()
    duck_pdf = con.sql(sql).df()
    # pandas NaN <-> None: unify missing values before comparison
    spark_pdf = spark_pdf.astype(object).where(pd.notna(spark_pdf), None)
    duck_pdf = duck_pdf.astype(object).where(pd.notna(duck_pdf), None)
    s_cols, s_rows = _frame_rows(spark_pdf, ordered)
    d_cols, d_rows = _frame_rows(duck_pdf, ordered)
    assert s_cols == d_cols, f"columns diverge for: {esql}\n{sql}"
    assert s_rows == d_rows, (
        f"rows diverge for: {esql}\n{sql}\nspark={s_rows[:5]}\nduck={d_rows[:5]}"
    )
