"""query_template compiler tests (reference entry point 2).

Mirrors the reference specs: template render + merge
(elasticsearch_spec.rb:526-551, fixtures query_template.json /
query_template_unicode.json), template size/sort overriding configs
(docs/index.asciidoc:101-103), and the query_string mini-grammar
(docs/index.asciidoc:36-53).
"""

import json

import pytest
from pyspark.sql import functions as F

from logstash_filter_elasticsearch_spark.plans.template import (
    Bool,
    EventRef,
    Exists,
    Lit,
    MatchAll,
    Range,
    TemplateError,
    Term,
    Terms,
    Wildcard,
    classify,
    compile_template,
    enrich_with_template,
    parse_query_string,
)


# ------------------------------------------------------------- pure parsing

def test_compile_term_terms_bool():
    t = compile_template(
        json.dumps(
            {
                "size": 3,
                "sort": [{"price": "desc"}, "name:asc"],
                "_source": ["price", "name"],
                "query": {
                    "bool": {
                        "filter": [
                            {"term": {"status": "F"}},
                            {"terms": {"prio": ["HIGH", "URGENT"]}},
                        ],
                        "must_not": [{"term": {"flag": "x"}}],
                    }
                },
            }
        )
    )
    assert t.size == 3
    assert t.sort == [("price", "desc"), ("name", "asc")]
    assert t.source_includes == ["price", "name"]
    conj = t.conjuncts()
    assert conj[0] == Term("status", Lit("F"))
    assert conj[1] == Terms("prio", (Lit("HIGH"), Lit("URGENT")))
    assert conj[2] == Bool("not", (Term("flag", Lit("x")),))


def test_event_ref_detection_and_classify():
    t = compile_template(
        {
            "query": {
                "bool": {
                    "must": [
                        {"term": {"k": "%{[user_id]}"}},
                        {"term": {"status": "F"}},
                        {"range": {"price": {"gte": "%{[value]}"}}},
                    ]
                }
            }
        }
    )
    static, join_pairs, theta = classify(t)
    assert [type(n) for n in static] == [Term]
    assert len(join_pairs) == 1 and join_pairs[0][1] == "k"
    assert len(theta) == 1 and isinstance(theta[0], Range)


def test_unicode_terms_roundtrip():
    """query_template_unicode.json fixture shape
    (spec elasticsearch_spec.rb:544-550)."""
    t = compile_template({"query": {"terms": {"lock": ["ほげ", "ぴよ"]}}})
    node = t.conjuncts()[0]
    assert node == Terms("lock", (Lit("ほげ"), Lit("ぴよ")))


def test_empty_template_rejected():
    with pytest.raises(TemplateError):
        compile_template({})  # elasticsearch.rb:432-433


def test_query_string_grammar():
    n = parse_query_string(
        'type:start AND opid:%{[opid]} AND bytes:[100 TO 200] '
        'AND NOT status:fail AND _exists_:verb AND path:api* AND msg:"hello world"',
        default_op="AND",
    )
    assert isinstance(n, Bool) and n.op == "and"
    kinds = [type(c) for c in n.children]
    assert kinds == [Term, Term, Range, Bool, Exists, Wildcard, Term]
    assert n.children[1] == Term("opid", EventRef("%{[opid]}"))
    assert n.children[2] == Range("bytes", (("gte", Lit(100)), ("lte", Lit(200))))
    assert n.children[6] == Term("msg", Lit("hello world"))


def test_query_string_or_parens_and_ranges():
    n = parse_query_string("(a:1 OR b:2) AND c:>=5", default_op="AND")
    assert n.op == "and"
    assert n.children[0] == Bool("or", (Term("a", Lit(1)), Term("b", Lit(2))))
    assert n.children[1] == Range("c", (("gte", Lit(5)),))


def test_query_string_default_or():
    n = parse_query_string("a:1 b:2")  # Lucene default_operator=OR
    assert isinstance(n, Bool) and n.op == "or"


def test_query_string_errors():
    with pytest.raises(TemplateError):
        parse_query_string("a:1 AND (b:2", default_op="AND")
    with pytest.raises(TemplateError):
        parse_query_string(":::")


# ------------------------------------------------------------- end-to-end

@pytest.fixture(scope="module")
def tiny(spark):
    events = spark.createDataFrame(
        [(1, 10, 150.0), (2, 20, 50.0), (3, 99, 10.0)],
        "event_id int, user_id int, value double",
    )
    lookup = spark.createDataFrame(
        [
            (10, "F", 100.0, "a"),
            (10, "F", 300.0, "b"),
            (10, "O", 500.0, "c"),
            (20, "F", 80.0, "d"),
        ],
        "custkey int, status string, price double, name string",
    )
    return events, lookup


def test_template_hash_join_path(tiny):
    events, lookup = tiny
    out = enrich_with_template(
        events,
        lookup,
        {
            "size": 1,
            "sort": [{"price": "desc"}],
            "query": {
                "bool": {
                    "filter": [
                        {"term": {"status": "F"}},
                        {"term": {"custkey": "%{[user_id]}"}},
                    ]
                }
            },
        },
        fields={"name": "top_name", "price": "top_price"},
    ).orderBy("event_id")
    rows = out.select(
        "event_id",
        F.element_at("top_name", 1).alias("n"),
        "_meta_total_hits",
        "matched",
    ).collect()
    assert [(r.event_id, r.n, r._meta_total_hits, r.matched) for r in rows] == [
        (1, "b", 2, True),   # status=F hits a(100),b(300); top by price desc = b
        (2, "d", 1, True),
        (3, None, 0, False),  # left-through, un-enriched
    ]


def test_template_static_only(tiny):
    events, lookup = tiny
    out = enrich_with_template(
        events,
        lookup,
        {"size": 10, "sort": [{"price": "asc"}], "query": {"term": {"status": "O"}}},
        fields={"name": "names"},
    )
    rows = out.select("event_id", "names").orderBy("event_id").collect()
    # every event gets the same (static) result set
    assert all(r.names == ["c"] for r in rows)


def test_template_theta_range_path(tiny):
    """Per-event range predicate: hits differ per event even at equal
    join keys -> theta join path."""
    events, lookup = tiny
    out = enrich_with_template(
        events,
        lookup,
        {
            "size": 5,
            "sort": [{"price": "asc"}],
            "query": {
                "bool": {
                    "must": [
                        {"term": {"custkey": "%{[user_id]}"}},
                        {"range": {"price": {"lte": "%{[value]}"}}},
                    ]
                }
            },
        },
        fields={"name": "names"},
        event_id="event_id",
    )
    rows = {r.event_id: (r.names, r.matched) for r in out.collect()}
    assert rows[1] == (["a"], True)          # price<=150 among custkey 10
    assert rows[2] == (None, False)          # 80 > 50? no: 80>50 -> no hit
    assert rows[3] == (None, False)


def test_template_source_includes_suppresses_fields(tiny):
    events, lookup = tiny
    out = enrich_with_template(
        events,
        lookup,
        {
            "_source": ["name"],
            "size": 1,
            "sort": [{"price": "desc"}],
            "query": {"term": {"custkey": "%{[user_id]}"}},
        },
        fields={"name": "n", "price": "p"},
    )
    assert "n" in out.columns and "p" not in out.columns


def test_wildcard_and_exists(tiny):
    events, lookup = tiny
    out = enrich_with_template(
        events,
        lookup,
        {
            "size": 10,
            "sort": [{"price": "asc"}],
            "query": {
                "bool": {
                    "must": [
                        {"term": {"custkey": "%{[user_id]}"}},
                        {"wildcard": {"name": "a*"}},
                        {"exists": {"field": "price"}},
                    ]
                }
            },
        },
        fields={"name": "names"},
    )
    rows = {r.event_id: r.names for r in out.collect()}
    assert rows[1] == ["a"] and rows[2] is None


def test_no_python_in_template_plan(tiny):
    events, lookup = tiny
    out = enrich_with_template(
        events,
        lookup,
        {"query": {"term": {"custkey": "%{[user_id]}"}}, "size": 1,
         "sort": [{"price": "desc"}]},
        fields={"name": "n"},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_wildcard_with_event_ref_translates(tiny):
    """Interpolated wildcard patterns get the same ES->LIKE translation
    as static ones: * maps to %, and %/_ in DATA are escaped."""
    events, lookup = tiny
    events = events.withColumn("prefix", F.lit("a"))
    out = enrich_with_template(
        events,
        lookup,
        {
            "size": 10,
            "sort": [{"price": "asc"}],
            "query": {
                "bool": {
                    "must": [
                        {"term": {"custkey": "%{[user_id]}"}},
                        {"wildcard": {"name": "%{[prefix]}*"}},
                    ]
                }
            },
        },
        fields={"name": "names"},
    )
    rows = {r.event_id: r.names for r in out.collect()}
    assert rows[1] == ["a"] and rows[2] is None


def test_wildcard_ref_escapes_like_metachars(spark):
    """A literal % in the interpolated pattern must NOT act as LIKE
    wildcard; only * and ? do."""
    events = spark.createDataFrame([(1, 1, "100%")], "event_id int, user_id int, pat string")
    lookup = spark.createDataFrame(
        [(1, "100%", 1.0), (1, "100x", 2.0)], "custkey int, name string, price double"
    )
    out = enrich_with_template(
        events,
        lookup,
        {
            "size": 10,
            "sort": [{"price": "asc"}],
            "query": {
                "bool": {
                    "must": [
                        {"term": {"custkey": "%{[user_id]}"}},
                        {"wildcard": {"name": "%{[pat]}*"}},
                    ]
                }
            },
        },
        fields={"name": "names"},
    )
    assert out.collect()[0]["names"] == ["100%"]  # not 100x


def test_bool_should_is_non_filtering_with_must():
    """ES: minimum_should_match defaults to 0 when must/filter present —
    should never narrows the hit set then; alone, it filters."""
    import json as _json

    t = compile_template(
        _json.dumps(
            {
                "query": {
                    "bool": {
                        "must": [{"term": {"a": 1}}],
                        "should": [{"term": {"b": 2}}],
                    }
                }
            }
        )
    )
    assert t.root == Term("a", Lit(1))  # should dropped from filter plan

    t2 = compile_template(
        _json.dumps({"query": {"bool": {"should": [
            {"term": {"b": 2}}, {"term": {"b": 3}},
        ]}}})
    )
    assert isinstance(t2.root, Bool) and t2.root.op == "or"


def test_uncoercible_event_key_no_match_not_abort(spark):
    """An event value that can't coerce to the lookup key type must
    simply not match (ANSI cast would abort the job on one bad event;
    the reference tags that event and moves on)."""
    import json

    events = spark.createDataFrame(
        [("e1", "42"), ("e2", "not-a-number")], "event_id string, opid string"
    )
    lookup = spark.createDataFrame(
        [(42, "answer")], "op bigint, label string"
    )
    template = json.dumps(
        {"query": {"term": {"op": "%{[opid]}"}}, "size": 1}
    )
    out = enrich_with_template(
        events, lookup, template, fields={"label": "label"}
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows["e1"]["label"] == ["answer"]
    assert rows["e2"]["label"] is None  # no match, row intact
    assert rows["e2"]["matched"] is False


# ------------------------------------------------------------- analyzed match

def test_match_analyzed_semantics(spark):
    """match = analyzed token overlap (OR default / AND operator);
    match_phrase = consecutive in-order tokens; term stays keyword
    equality. Standard-analyzer approximation: lowercase + split on
    non-letter/digit (docs/index.asciidoc:85-103 templates)."""
    from logstash_filter_elasticsearch_spark.plans.template import (
        Match,
        to_column,
    )

    df = spark.createDataFrame(
        [
            (1, "Quick Brown Fox jumps"),
            (2, "the brown dog"),
            (3, "fox-trot: QUICK!"),
            (4, "nothing here"),
            (5, None),
        ],
        "id long, txt string",
    )

    def ids(node):
        return sorted(
            r["id"] for r in df.filter(to_column(node, F.col)).collect()
        )

    t = compile_template({"query": {"match": {"txt": "quick FOX"}}})
    assert isinstance(t.conjuncts()[0], Match)
    assert ids(t.conjuncts()[0]) == [1, 3]  # any token, case-folded

    t = compile_template(
        {"query": {"match": {"txt": {"query": "quick fox", "operator": "and"}}}}
    )
    assert ids(t.conjuncts()[0]) == [1, 3]  # both tokens required
    t = compile_template(
        {"query": {"match": {"txt": {"query": "brown fox", "operator": "and"}}}}
    )
    assert ids(t.conjuncts()[0]) == [1]  # dog row lacks 'fox'

    t = compile_template({"query": {"match_phrase": {"txt": "brown fox"}}})
    assert ids(t.conjuncts()[0]) == [1]  # adjacent + ordered only
    t = compile_template({"query": {"match_phrase": {"txt": "fox brown"}}})
    assert ids(t.conjuncts()[0]) == []  # order matters

    # punctuation is a token break: 'fox-trot' analyzes to [fox, trot]
    t = compile_template({"query": {"match_phrase": {"txt": "fox trot"}}})
    assert ids(t.conjuncts()[0]) == [3]

    # zero-terms query matches nothing (ES zero_terms_query: none)
    t = compile_template({"query": {"match": {"txt": "..."}}})
    assert ids(t.conjuncts()[0]) == []

    # term keeps exact keyword equality — no analysis
    t = compile_template({"query": {"term": {"txt": "the brown dog"}}})
    assert ids(t.conjuncts()[0]) == [2]

    with pytest.raises(TemplateError, match="match operator"):
        compile_template(
            {"query": {"match": {"txt": {"query": "x", "operator": "nor"}}}}
        )


def test_match_with_event_ref_classifies_theta(spark):
    """A ref-bearing match is not an equality — it must go to the theta
    path, never the hash-join keys; and the compiled condition analyzes
    the interpolated query per event."""
    from logstash_filter_elasticsearch_spark.plans.template import Match

    t = compile_template(
        {"query": {"match": {"txt": "%{[needle]}"}}}
    )
    static, join_pairs, theta = classify(t)
    assert static == [] and join_pairs == []
    assert len(theta) == 1 and isinstance(theta[0], Match)


def test_prefix_and_ids_nodes(spark):
    """prefix = un-analyzed leading match (pushed as StringStartsWith on
    the static path); ids = terms over the _id envelope column."""
    from logstash_filter_elasticsearch_spark.plans.template import (
        Prefix,
        to_column,
    )

    df = spark.createDataFrame(
        [("k1", "alpha-1"), ("k2", "alphabet"), ("k3", "beta-2")],
        "_id string, name string",
    )
    t = compile_template({"query": {"prefix": {"name": "alpha"}}})
    node = t.conjuncts()[0]
    assert isinstance(node, Prefix)
    got = sorted(
        r["_id"] for r in df.filter(to_column(node, F.col)).collect()
    )
    assert got == ["k1", "k2"]
    # long form + classification: ref-bearing prefix goes to theta
    t = compile_template(
        {"query": {"prefix": {"name": {"value": "%{[stem]}"}}}}
    )
    static, join_pairs, theta = classify(t)
    assert join_pairs == [] and len(theta) == 1

    t = compile_template({"query": {"ids": {"values": ["k1", "k3"]}}})
    node = t.conjuncts()[0]
    assert node == Terms("_id", (Lit("k1"), Lit("k3")))
    got = sorted(
        r["_id"] for r in df.filter(to_column(node, F.col)).collect()
    )
    assert got == ["k1", "k3"]


def test_regexp_and_match_phrase_prefix(spark):
    """regexp = anchored full-value match (ES semantics, unlike bare
    rlike); match_phrase_prefix = phrase adjacency with the last query
    token matching as a prefix."""
    from logstash_filter_elasticsearch_spark.plans.template import (
        Match,
        Regexp,
        to_column,
    )

    df = spark.createDataFrame(
        [(1, "srv-001", "quick brown foxes run"),
         (2, "srv-1a", "brown fox"),
         (3, "xsrv-001", "the foxtrot dance")],
        "id long, host string, txt string",
    )

    def ids(node):
        return sorted(
            r["id"] for r in df.filter(to_column(node, F.col)).collect()
        )

    t = compile_template({"query": {"regexp": {"host": "srv-[0-9]+"}}})
    assert isinstance(t.conjuncts()[0], Regexp)
    assert ids(t.conjuncts()[0]) == [1]  # full anchor: no srv-1a, no xsrv

    t = compile_template(
        {"query": {"regexp": {"host": {"value": ".*srv-00[12]"}}}}
    )
    assert ids(t.conjuncts()[0]) == [1, 3]

    t = compile_template(
        {"query": {"match_phrase_prefix": {"txt": "brown fox"}}}
    )
    n = t.conjuncts()[0]
    assert isinstance(n, Match) and n.phrase_prefix
    # 'brown foxes' (prefix hit) and 'brown fox' (exact) match;
    # 'the foxtrot' lacks the adjacent 'brown' so it does not
    assert ids(n) == [1, 2]
    # plain match_phrase stays exact-token: no 'foxes'
    t = compile_template({"query": {"match_phrase": {"txt": "brown fox"}}})
    assert ids(t.conjuncts()[0]) == [2]


def test_query_string_field_groups():
    # Lucene field group distributes the field over the group
    n = parse_query_string("status:(active OR pending)", default_op="AND")
    assert n == Bool("or", (Term("status", Lit("active")),
                            Term("status", Lit("pending"))))
    # default_op applies inside the group; nesting + NOT pass through
    n = parse_query_string(
        "lvl:(error NOT (warn OR info)) AND svc:api", default_op="AND"
    )
    assert n.op == "and"
    grp = n.children[0]
    assert grp.op == "and" and grp.children[0] == Term("lvl", Lit("error"))
    assert grp.children[1].op == "not"
    # a field:( inside a quoted phrase is literal text, not a group
    n = parse_query_string('msg:"see x:(y)"')
    assert n == Term("msg", Lit("see x:(y)"))
    with pytest.raises(TemplateError, match="unterminated field group"):
        parse_query_string("status:(a OR b")


def test_query_string_escapes():
    # \-escaped specials are literal characters
    n = parse_query_string(r"path:\(1\+1\)\:2", default_op="AND")
    assert n == Term("path", Lit("(1+1):2"))
    n = parse_query_string(r"msg:a\ b", default_op="AND")
    assert n == Term("msg", Lit("a b"))
    # escaped wildcard chars are literal -> Term, not Wildcard
    n = parse_query_string(r"f:two\*three")
    assert n == Term("f", Lit("two*three"))
    # unescaped wildcard still wildcards; _like_pattern keeps \* literal
    from logstash_filter_elasticsearch_spark.plans.template import (
        Wildcard as W, _like_pattern,
    )
    n = parse_query_string(r"f:two\**")
    assert isinstance(n, W)
    assert _like_pattern(n.pattern.value) == "two*%"
    assert _like_pattern(r"a\\b*c_d") == "a\\\\b%c\\_d"


def test_query_string_fuzzy_and_boost(spark):
    from logstash_filter_elasticsearch_spark.plans.template import (
        Fuzzy, to_column,
    )
    n = parse_query_string("name:roam~", default_op="AND")
    assert n == Fuzzy("name", Lit("roam"), max_edits=None)
    n = parse_query_string("name:roam~1")
    assert n == Fuzzy("name", Lit("roam"), max_edits=1)
    with pytest.raises(TemplateError, match="at most 2"):
        parse_query_string("name:roam~5")
    # boost is recognized and stripped (scoring-only)
    assert parse_query_string("f:qu^2") == Term("f", Lit("qu"))
    assert parse_query_string('f:"a b"^3') == Term("f", Lit("a b"))
    assert parse_query_string("(a:1 OR b:2)^2", default_op="AND") == Bool(
        "or", (Term("a", Lit(1)), Term("b", Lit(2)))
    )
    # execution: AUTO fuzziness on 'roam' (len 4 -> 1 edit)
    df = spark.createDataFrame(
        [(1, "roam"), (2, "foam"), (3, "roams"), (4, "rome"), (5, "remap")],
        "id long, name string",
    )
    got = sorted(
        r["id"] for r in df.filter(
            to_column(parse_query_string("name:roam~"), F.col)
        ).collect()
    )
    assert got == [1, 2, 3]  # foam/roams are 1 edit; rome is 2; remap 3


def test_phrase_slop_query_string_and_json(spark):
    from logstash_filter_elasticsearch_spark.plans.template import (
        Match, to_column,
    )
    n = parse_query_string('txt:"quick fox"~1', default_op="AND")
    assert isinstance(n, Match) and n.phrase and n.slop == 1
    df = spark.createDataFrame(
        [(1, "quick fox"), (2, "quick brown fox"),
         (3, "quick red brown fox"), (4, "fox quick")],
        "id long, txt string",
    )

    def ids(node):
        return sorted(
            r["id"] for r in df.filter(to_column(node, F.col)).collect()
        )

    assert ids(n) == [1, 2]  # slop 1: one intervening token allowed
    t = compile_template(
        {"query": {"match_phrase": {"txt": {"query": "quick fox", "slop": 2}}}}
    )
    assert ids(t.conjuncts()[0]) == [1, 2, 3]
    with pytest.raises(TemplateError, match="slop"):
        compile_template(
            {"query": {"match": {"txt": {"query": "x", "slop": 1}}}}
        )
