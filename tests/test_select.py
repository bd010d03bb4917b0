"""The `select` pipeline surface: script-syntax translation, dynamic
columns + window functions, drilldowns (labeled/multi/calc), slices,
sort/offset/limit, adjuster, match escalation (SURVEY.md §3.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from groonga_spark.select import script_to_sql, select

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.mark.parametrize("expr,sql", [
    ('lang == "en" && n_chars > 10', 'lang = "en" AND n_chars > 10'),
    ('a == 1 || !(b == 2)', "a = 1 OR NOT (b = 2)"),
    ('text @ "spark"', "contains(text, 'spark')"),
    ('text @^ "sp"', "startswith(text, 'sp')"),
    ('text @$ "rk"', "endswith(text, 'rk')"),
    ('text @~ "s.k"', "(text RLIKE '(?m)s.k')"),
    ("all_records()", "true"),
    # operators INSIDE string literals must survive untouched
    ('text @ "a && b"', "contains(text, 'a && b')"),
    ('name == "x!y"', 'name = "x!y"'),
    ("name == 'a||b == c'", "name = 'a||b == c'"),
    ('a @ "x" && b @~ "y|z"',
     "contains(a, 'x') AND (b RLIKE '(?m)y|z')"),
    ('in_values(lang, "a&&b", "c")', 'lang IN ( "a&&b", "c")'),
])
def test_script_to_sql(expr, sql):
    assert " ".join(script_to_sql(expr).split()) == sql


def test_script_filter_with_operators_in_literals(spark):
    """End-to-end: a filter whose string literal contains script
    operators selects by the LITERAL text, not a mangled expression."""
    df = spark.createDataFrame(
        [(0, "a && b"), (1, "plain"), (2, "x!y || z")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in
           select(df, filter='text @ "&& b" || text == "x!y || z"',
                  limit=-1, need_hit_count=False).hits.collect()}
    assert got == {0, 2}


def test_filter_sort_offset_limit(spark, docs):
    res = select(
        docs,
        filter='lang == "en" && n_chars > 300',
        sort_keys="-n_chars,doc_id",
        offset=2,
        limit=5,
        output_columns=["doc_id", "n_chars"],
    )
    rows = res.hits.collect()
    want = (
        docs.filter("lang = 'en' AND n_chars > 300")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .collect()
    )
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in want[2:7]]
    assert res.n_hits == len(want)


def test_labeled_drilldowns_and_having(spark, docs):
    res = select(
        docs,
        limit=0,
        drilldowns={
            "langs": {"keys": "lang", "filter": "_nsubrecs > 50",
                      "sort_keys": "-_nsubrecs", "limit": 2},
        },
    )
    got = res.drilldowns["langs"].collect()
    want = (
        docs.groupBy("lang").count().filter("count > 50")
        .orderBy(F.desc("count")).limit(2).collect()
    )
    assert [(r["_key"], r["_nsubrecs"]) for r in got] == [
        (r["lang"], r["count"]) for r in want
    ]


def test_dynamic_column_window(spark, docs):
    res = select(
        docs,
        limit=-1,
        columns={
            "rn": {
                "stage": "initial",
                "value": "record_number()",
                "window": {"group_keys": ["lang"], "sort_keys": ["doc_id"]},
            }
        },
        filter="rn == 1",
        output_columns=["doc_id", "lang", "rn"],
    )
    got = {r["lang"]: r["doc_id"] for r in res.hits.collect()}
    want = {
        r["lang"]: r["m"]
        for r in docs.groupBy("lang").agg(F.min("doc_id").alias("m")).collect()
    }
    assert got == want


def test_slices(spark, docs):
    res = select(docs, filter="n_chars > 100", limit=0,
                 slices={"en": {"filter": 'lang == "en"', "limit": 3,
                                "sort_keys": "doc_id"}})
    rows = res.slices["en"].collect()
    want = (docs.filter("n_chars > 100 AND lang = 'en'")
            .orderBy("doc_id").limit(3).collect())
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in want]


def test_query_with_index_and_adjuster(spark, docs, tmp_path):
    from groonga_spark.build import build_index
    from groonga_spark.search import FulltextIndex

    path = str(tmp_path / "idx_sel")
    build_index(spark, docs, path, mode="delimit", segment_size=200)
    idx = FulltextIndex(spark, path)

    res = select(
        docs, index=idx, query="spark",
        adjuster=[("fast", 2.0)],
        sort_keys="-_score,_id", limit=5,
        output_columns=["doc_id", "_score"],
    )
    rows = [(r["doc_id"], r["_score"]) for r in res.hits.collect()]

    base = {r["doc_id"]: r["score"] for r in idx.match_docs("spark").collect()}
    boost = {r["doc_id"]: r["score"] for r in idx.match_docs("fast").collect()}
    want = sorted(
        ((d, s + 2.0 * boost.get(d, 0.0)) for d, s in base.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert [d for d, _ in rows] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(rows, want):
        assert abs(gs - ws) < 1e-9


def test_match_escalation(spark, docs, tmp_path):
    from groonga_spark.build import build_index
    from groonga_spark.search import FulltextIndex

    path = str(tmp_path / "idx_esc")
    build_index(spark, docs, path, mode="delimit", segment_size=200)
    idx = FulltextIndex(spark, path)

    # a term absent from the lexicon → 0 hits → escalates to prefix OR
    res = select(docs, index=idx, query="spar",
                 match_escalation_threshold=0, limit=-1,
                 output_columns=["doc_id"])
    n_prefix = idx.match_docs("spar*").count()
    assert res.n_hits == n_prefix > 0


def test_script_embedded_query_in_filter(spark, tmp_path):
    """filter='query("text","...") && <expr>' — the script-syntax query()
    call evaluates through the index and composes with Catalyst."""
    from groonga_spark.build import build_index
    from groonga_spark.search import FulltextIndex
    from groonga_spark.select import select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "idx_qf")
    build_index(spark, docs, path, mode="delimit", segment_size=200)
    idx = FulltextIndex(spark, path)

    with select(docs, index=idx,
                filter='query("text", "spark merge") && n_chars > 300',
                sort_keys="doc_id", limit=-1,
                output_columns=["doc_id", "n_chars"]) as res:
        got = {r["doc_id"] for r in res.hits.collect()}
    m = {r["doc_id"] for r in idx.match_docs("spark merge").collect()}
    want = {r["doc_id"] for r in
            docs.filter("n_chars > 300").collect() if r["doc_id"] in m}
    assert got == want and len(got) > 0
    # OR-composes and negates
    with select(docs, index=idx,
                filter='query("text", "spark") || n_chars > 990',
                limit=-1) as res2:
        got2 = {r["doc_id"] for r in res2.hits.collect()}
    ms = {r["doc_id"] for r in idx.match_docs("spark").collect()}
    big = {r["doc_id"] for r in docs.filter("n_chars > 990").collect()}
    assert got2 == ms | big


def test_geo_functions(spark):
    """geo_distance/in_circle/in_rectangle over both GeoPoint literal
    forms (degrees with '.', bare milliseconds)."""
    import math

    from pyspark.sql import functions as F

    from groonga_spark.functions import (
        GEO_RADIUS_M,
        geo_distance,
        geo_in_circle,
        geo_in_rectangle,
    )

    df = spark.createDataFrame(
        [("35.5x139.25", "127800000x501300000")],  # same point, both forms
        "deg string, ms string")
    r = df.select(
        geo_distance("deg", F.lit("35.5x139.25")).alias("zero"),
        geo_distance("deg", F.col("ms"), "sphere").alias("d_forms"),
        geo_distance(F.lit("0x0"), F.lit("0x3600000")).alias("one_deg_lon"),
        geo_in_circle("deg", F.lit("35.0x139.0"), 200_000).alias("near"),
        geo_in_circle("deg", F.lit("0x0"), 1000).alias("far"),
        geo_in_rectangle("deg", F.lit("36.0x139.0"),
                         F.lit("35.0x140.0")).alias("in_rect"),
    ).collect()[0]
    assert r["zero"] == 0.0
    assert r["d_forms"] == 0.0    # ms form parses to the identical point
    # one degree of longitude at the equator = R·(π/180)
    assert abs(r["one_deg_lon"] - GEO_RADIUS_M * math.pi / 180) < 1e-6
    assert r["near"] and not r["far"] and r["in_rect"]


def test_output_columns_expressions(spark):
    """output_columns accepts script-syntax expressions, not just names
    (the reference's computed output columns)."""
    from groonga_spark.select import select

    df = spark.range(5).withColumn("n", F.col("id") * 10)
    with select(df, sort_keys="id", limit=-1, id_col="id",
                output_columns="id, n * 2, id == 3") as res:
        rows = res.hits.collect()
    assert [tuple(r) for r in rows][:2] == [(0, 0, False), (1, 20, False)]
    assert rows[3][2] is True


def test_scorer_parameter(spark, tmp_path):
    """--scorer '_score = expr': per-record score reassignment/adjust."""
    from groonga_spark.build import build_index
    from groonga_spark.search import FulltextIndex
    from groonga_spark.select import select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "idx_sc")
    build_index(spark, docs, path, mode="delimit", segment_size=500)
    idx = FulltextIndex(spark, path)

    with select(docs, index=idx, query="spark",
                scorer="_score = n_chars",
                sort_keys="-_score,doc_id", limit=5,
                output_columns=["doc_id", "_score", "n_chars"]) as res:
        rows = res.hits.collect()
    assert all(r["_score"] == float(r["n_chars"]) for r in rows)
    assert [r["_score"] for r in rows] == sorted(
        [r["_score"] for r in rows], reverse=True)

    with select(docs, index=idx, query="spark",
                scorer="_score = _score * 2", sort_keys="-_score,doc_id",
                limit=3, output_columns=["doc_id", "_score"]) as res2:
        doubled = [(r["doc_id"], r["_score"]) for r in res2.hits.collect()]
    with select(docs, index=idx, query="spark",
                sort_keys="-_score,doc_id", limit=3,
                output_columns=["doc_id", "_score"]) as res3:
        base = [(r["doc_id"], r["_score"]) for r in res3.hits.collect()]
    assert doubled == [(d, s * 2) for d, s in base]

    import pytest as _pt

    with _pt.raises(ValueError):
        select(docs, scorer="n_chars + 1")


def test_scorer_runs_after_filter(spark, tmp_path):
    """grn_select evaluation order: scorer applies to the POST-selection
    match set — a filter referencing _score sees the ORIGINAL match
    score, not the reassigned one."""
    from groonga_spark.build import build_index
    from groonga_spark.search import FulltextIndex
    from groonga_spark.select import select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "idx_sc_order")
    build_index(spark, docs, path, mode="delimit", segment_size=500)
    idx = FulltextIndex(spark, path)

    n_matches = idx.match_docs("spark").count()
    assert n_matches > 0
    # every BM25 match score is > 0; scorer zeroes them AFTER the filter —
    # if scorer ran first, the filter would select nothing
    with select(docs, index=idx, query="spark",
                filter="_score > 0", scorer="_score = 0",
                limit=-1, output_columns=["doc_id", "_score"],
                need_hit_count=False) as res:
        rows = res.hits.collect()
    assert len(rows) == n_matches
    assert all(r["_score"] == 0.0 for r in rows)

    # …while POST_FILTER sees the scorer-updated score (filter → scorer
    # → post_filter): scorer pins every score to 5, so '_score > 4'
    # keeps everything and '_score > 5' keeps nothing
    with select(docs, index=idx, query="spark", scorer="_score = 5",
                post_filter="_score > 4", limit=-1,
                output_columns=["doc_id", "_score"],
                need_hit_count=False) as res2:
        assert len(res2.hits.collect()) == n_matches
    with select(docs, index=idx, query="spark", scorer="_score = 5",
                post_filter="_score > 5", limit=-1,
                output_columns=["doc_id"], need_hit_count=False) as res3:
        assert res3.hits.count() == 0


def test_match_columns_needs_multifield(spark, tmp_path):
    """match_columns= with a single-field index raises a clear error
    instead of an uncaught TypeError."""
    from groonga_spark.build import build_index
    from groonga_spark.search import FulltextIndex
    from groonga_spark.select import select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "idx_mc_err")
    build_index(spark, docs, path, mode="delimit", segment_size=500)
    idx = FulltextIndex(spark, path)
    with pytest.raises(ValueError, match="match_columns"):
        select(docs, index=idx, query="spark", match_columns="title||body")


def test_script_to_sql_literal_preservation_property():
    """Property: string literals pass through script_to_sql VERBATIM
    (modulo the match-op value's quote normalization) no matter what
    operator soup surrounds or fills them."""
    import random

    from groonga_spark.select import _lex_script

    rng = random.Random(99)
    ops = ["&&", "||", "==", "!", "@", "@^", "@~", "in_values(", ")"]
    fillers = ["a", "b7", "x_y", " ", "1"]

    def rand_literal(q):
        body = "".join(rng.choice(ops + fillers) for _ in range(rng.randrange(0, 6)))
        body = body.replace(q, "")  # no quote-in-quote (escapes tested elsewhere)
        return f"{q}{body}{q}"

    for _ in range(200):
        parts = []
        lits = []
        for _ in range(rng.randrange(1, 6)):
            if rng.random() < 0.5:
                q = rng.choice(["'", '"'])
                lit = rand_literal(q)
                lits.append(lit)
                parts.append(lit)
            else:
                parts.append(rng.choice(["a == 1", "b && c", "x || !y",
                                         "n > 3", "f(", ")"]))
        expr = " ".join(parts)
        out = script_to_sql(expr)
        # every literal that is NOT a match-op value must appear verbatim
        toks = _lex_script(expr)
        for i, (kind, text) in enumerate(toks):
            if kind != "str":
                continue
            prev = toks[i - 1][1] if i and toks[i - 1][0] == "code" else ""
            import re as _re
            if _re.search(r"[A-Za-z_][A-Za-z0-9_.]*\s*(@\^|@\$|@~|@)\s*$",
                          prev):
                continue  # match-op value: quotes may normalize
            assert text in out, (expr, text, out)


def test_escalation_with_metachar_lexicon_terms(spark, tmp_path):
    """Escalated lexicon terms may contain QL metacharacters ('-', '(',
    trailing '*') — the AST-based escalation must match them literally
    instead of re-lexing them as operators."""
    from groonga_spark.build import build_index
    from groonga_spark.search import FulltextIndex

    rows = [(0, "fax one"), (1, "fa(x two"), (2, "-fay three"),
            (3, "faz* four"), (4, "nothing here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "idx_esc_meta")
    build_index(spark, df, path, mode="delimit", segment_size=100)
    idx = FulltextIndex(spark, path)
    # 'fa' is not a lexicon term → escalates to the prefix OR over
    # {fax, fa(x, faz*} — docs 0, 1, 3 (NOT 2: '-fay' ≠ prefix 'fa')
    res = select(df, index=idx, query="fa",
                 match_escalation_threshold=0, limit=-1,
                 output_columns=["doc_id"], need_hit_count=False)
    got = {r["doc_id"] for r in res.hits.collect()}
    assert got == {0, 1, 3}


def test_negative_offset_counts_from_end(spark, docs):
    """Reference pagination: offset=-N starts N records before the end
    of the matched set (offset=-1 ⇒ last record)."""
    res = select(
        docs,
        filter='lang == "en"',
        sort_keys="doc_id",
        offset=-3,
        limit=10,
        output_columns=["doc_id"],
    )
    want = [r["doc_id"] for r in
            docs.filter("lang = 'en'").orderBy("doc_id").collect()]
    assert [r["doc_id"] for r in res.hits.collect()] == want[-3:]
    # lazy path (need_hit_count=False) must still resolve the offset
    res2 = select(
        docs,
        filter='lang == "en"',
        sort_keys="doc_id",
        offset=-1,
        limit=10,
        output_columns=["doc_id"],
        need_hit_count=False,
    )
    assert [r["doc_id"] for r in res2.hits.collect()] == want[-1:]


def test_dot_path_reference_accessors(spark):
    """references= resolves the reference idiom ``fk.sub`` in filter /
    sort_keys / output_columns / drilldown keys via one broadcast join
    per dimension, keeping the dotted output label."""
    users = spark.createDataFrame(
        [(0, "u0", 10), (1, "u1", 20), (2, "u2", 10), (3, "u3", 30)],
        "doc_id long, name string, dept_id long",
    )
    depts = spark.createDataFrame(
        [(10, "eng", "B1"), (20, "ops", "B2"), (30, "eng", "B2")],
        "d_id long, d_name string, building string",
    )
    res = select(
        users,
        filter='dept_id.d_name == "eng"',
        sort_keys="-dept_id.building,doc_id",
        output_columns=["doc_id", "name", "dept_id.building"],
        references={"dept_id": (depts, "d_id")},
        limit=-1,
    )
    rows = res.hits.collect()
    assert res.hits.columns == ["doc_id", "name", "dept_id.building"]
    assert [(r["doc_id"], r["dept_id.building"]) for r in rows] == [
        (3, "B2"), (0, "B1"), (2, "B1")
    ]
    # drilldown on a dotted key
    res2 = select(
        users,
        drilldowns=[{"keys": ["dept_id.d_name"]}],
        references={"dept_id": (depts, "d_id")},
        limit=0,
    )
    dd = {tuple(r) for r in list(res2.drilldowns.values())[0].collect()}
    assert dd == {("eng", 3), ("ops", 1)}
    # literals containing dots are untouched
    res3 = select(
        users,
        filter='name == "u1" || name @ "x.y"',
        references={"dept_id": (depts, "d_id")},
        output_columns=["doc_id"],
        limit=-1,
    )
    assert [r["doc_id"] for r in res3.hits.collect()] == [1]


def test_dot_path_chained_accessors(spark):
    """Chained accessor ``a.b.c`` (the reference's full accessor-chain
    idiom): every intermediate hop must be a registered reference; the
    chain folds into one broadcast lookup."""
    users = spark.createDataFrame(
        [(0, "u0", 10), (1, "u1", 20), (2, "u2", 10), (3, "u3", 30)],
        "doc_id long, name string, dept_id long",
    )
    depts = spark.createDataFrame(
        [(10, "eng", 100), (20, "ops", 200), (30, "eng", 200)],
        "d_id long, d_name string, building_id long",
    )
    buildings = spark.createDataFrame(
        [(100, "HQ", "Berlin"), (200, "Annex", "Kyoto")],
        "b_id long, b_name string, city string",
    )
    refs = {
        "dept_id": (depts, "d_id"),
        "building_id": (buildings, "b_id"),
    }
    res = select(
        users,
        filter='dept_id.building_id.city == "Kyoto"',
        sort_keys="doc_id",
        output_columns=["doc_id", "name", "dept_id.building_id.b_name",
                        "dept_id.d_name"],
        references=refs,
        limit=-1,
    )
    rows = res.hits.collect()
    assert res.hits.columns == [
        "doc_id", "name", "dept_id.building_id.b_name", "dept_id.d_name"
    ]
    assert [(r["doc_id"], r["dept_id.building_id.b_name"],
             r["dept_id.d_name"]) for r in rows] == [
        (1, "Annex", "ops"), (3, "Annex", "eng")
    ]
    # drilldown on a chained key
    res2 = select(
        users,
        drilldowns=[{"keys": ["dept_id.building_id.city"]}],
        references=refs,
        limit=0,
    )
    dd = {tuple(r) for r in list(res2.drilldowns.values())[0].collect()}
    assert dd == {("Berlin", 2), ("Kyoto", 2)}
    # unregistered intermediate hop raises with guidance
    import pytest as _pytest

    with _pytest.raises(ValueError, match="intermediate column"):
        select(
            users,
            filter='dept_id.building_id.city == "Kyoto"',
            references={"dept_id": (depts, "d_id")},
            output_columns=["doc_id"],
            limit=-1,
        ).hits.collect()


def test_ref_join_same_named_fk_pk_keeps_key(spark):
    """fk == pk (the common shared-name foreign key): the join key
    column must survive — Dataset.drop(name) removes every column with
    that name, so the dimension key needs a private alias."""
    from groonga_spark.relations import ref_join

    orders = spark.createDataFrame([(0, 7), (1, 8)],
                                   "order_id long, user_id long")
    users = spark.createDataFrame([(7, "u7"), (8, "u8")],
                                  "user_id long, name string")
    out = ref_join(orders, users, fk="user_id", pk="user_id")
    assert "user_id" in out.columns
    assert {(r["order_id"], r["user_id"], r["name"])
            for r in out.collect()} == {(0, 7, "u7"), (1, 8, "u8")}


def test_escalation_preserves_structure(spark, docs, tmp_path):
    """Escalation relaxes each POSITIVE term in place: an OR stays an
    OR, and a negated term stays exact (expanding the subtracted side
    would remove MORE docs — the opposite of relaxing)."""
    from groonga_spark.build import build_index
    from groonga_spark.search import FulltextIndex
    from groonga_spark.select import _escalate_ast

    path = str(tmp_path / "idx_esc_struct")
    build_index(spark, docs, path, mode="delimit", segment_size=200)
    idx = FulltextIndex(spark, path)

    # negation survives and its term stays exact: 'spar -table' must
    # escalate to (spar-expansion AND NOT table), never require 'table'
    res = select(docs, index=idx, query="spar -table",
                 match_escalation_threshold=0, limit=-1,
                 output_columns=["doc_id"])
    want = ({r["doc_id"] for r in idx.match_docs("spar*").collect()}
            - {r["doc_id"] for r in idx.match_docs("table").collect()})
    got = {r["doc_id"] for r in res.hits.collect()}
    assert got == want and got

    # OR stays an OR: 'spar OR table' escalates to (spar-exp OR table)
    ast = _escalate_ast(idx, "spar OR table")
    from groonga_spark.ql import Or

    assert isinstance(ast, Or)
    got2 = {r["doc_id"] for r in idx.match_ast(ast).collect()}
    want2 = ({r["doc_id"] for r in idx.match_docs("spar*").collect()}
             | {r["doc_id"] for r in idx.match_docs("table").collect()})
    assert got2 == want2


def test_window_aggregate_is_whole_partition_with_sort_keys(spark):
    """window_sum/window_count with sort_keys must still be the WHOLE
    group total (Groonga window functions are whole-partition; sort_keys
    only order the ranking functions) — not Spark's default running
    frame."""
    df = spark.createDataFrame(
        [(0, "a", 1), (1, "a", 2), (2, "a", 4), (3, "b", 10)],
        "doc_id long, g string, n long",
    )
    res = select(
        df,
        columns={
            "s": {"stage": "initial", "value": "window_sum(n)",
                  "window": {"group_keys": ["g"], "sort_keys": ["doc_id"]}},
            "rn": {"stage": "initial", "value": "record_number()",
                   "window": {"group_keys": ["g"], "sort_keys": ["doc_id"]}},
        },
        sort_keys="doc_id",
        output_columns=["doc_id", "s", "rn"],
        limit=-1,
    )
    rows = [(r["doc_id"], r["s"], r["rn"]) for r in res.hits.collect()]
    assert rows == [(0, 7, 1), (1, 7, 2), (2, 7, 3), (3, 10, 1)]


def test_drilldown_string_keys_label(spark, docs):
    res = select(docs, drilldowns=[{"keys": "lang"}], limit=0)
    assert list(res.drilldowns) == ["lang"]


def test_query_call_inside_string_literal_is_data(spark, docs, tmp_path):
    """query(...) text INSIDE a quoted literal is data for comparison,
    not an index call."""
    from groonga_spark.build import build_index
    from groonga_spark.search import FulltextIndex

    path = str(tmp_path / "idx_qlit")
    df = spark.createDataFrame(
        [(0, 'try query("text", "x") here'), (1, "other")],
        "doc_id long, note string",
    )
    build_index(spark, df.withColumnRenamed("note", "text"), path,
                mode="delimit", segment_size=10)
    idx = FulltextIndex(spark, path)
    res = select(
        df, index=idx,
        filter='note @ "query(\\"text\\", \\"x\\")"',
        output_columns=["doc_id"], limit=-1,
    )
    assert [r["doc_id"] for r in res.hits.collect()] == [0]


ONIGMO_CASES = [
    (r"\h+", "[0-9a-fA-F]+"),
    (r"\H", "[^0-9a-fA-F]"),
    (r"[\h]+", "[0-9a-fA-F]+"),
    ("[[:alpha:]]+", r"[\p{Alpha}]+"),
    ("[[:^digit:]]", r"[\P{Digit}]"),
    ("[[:word:][:space:]]", r"[\w\s]"),
    ("(?m)a.b", "(?s)a.b"),          # Ruby m = DOTALL, Java m = MULTILINE
    ("(?im:x)", "(?is:x)"),
    ("(?i-m)x", "(?i-s)x"),
    ("[]x]", r"[\]x]"),              # leading ] literal in Onigmo
    ("(?<y>a)\\k<y>", "(?<y>a)\\k<y>"),  # shared syntax passes through
    (r"a\d+\.b", r"a\d+\.b"),
    ("(?=x)y", "(?=x)y"),
]


@pytest.mark.parametrize("src,want", ONIGMO_CASES,
                         ids=[c[0] for c in ONIGMO_CASES])
def test_onigmo_to_java(src, want):
    """@~ patterns are Onigmo dialect [G: vendor/onigmo]; Spark RLIKE
    runs java.util.regex — the silently-diverging constructs (\\h hex
    class, POSIX brackets, Ruby's always-on line anchors and
    m-means-dotall) must be bridged; untranslatable class constructs
    and unknown POSIX names raise instead of silently diverging."""
    from groonga_spark.select import onigmo_to_java

    # every translation runs under (?m): Onigmo ^/$ are ALWAYS line
    # anchors, Java defaults to string anchors
    assert onigmo_to_java(src) == "(?m)" + want
    with pytest.raises(ValueError, match="POSIX"):
        onigmo_to_java("[[:foo:]]")
    with pytest.raises(ValueError, match="Java regex"):
        onigmo_to_java(r"[x\H]")


def test_regex_match_bridges_dialect_end_to_end(spark):
    """`text @~ "..."` filters run the ONIGMO meaning on Spark: hex
    class, POSIX brackets, and dotall-m all behave as the reference
    user expects."""
    from groonga_spark.select import select

    df = spark.createDataFrame(
        [(1, "deadbeef"), (2, "no hex here!"), (3, "a\nb"), (4, "AB12")],
        "doc_id long, text string",
    )

    def ids(flt):
        with select(df, filter=flt, limit=-1, sort_keys="doc_id") as r:
            return [x["doc_id"] for x in r.hits.collect()]

    # Onigmo ^/$ are LINE anchors: doc 3's lines "a"/"b" are hex too
    assert ids('text @~ "^\\\\h+$"') == [1, 3, 4]     # Onigmo \h = hex
    assert ids('text @~ "[[:punct:]]"') == [2]       # POSIX bracket
    assert ids('text @~ "^[[:alpha:][:space:]!]+$"') == [1, 2, 3]
    assert ids('text @~ "(?m)^a.b$"') == [3]         # Ruby m = dotall
