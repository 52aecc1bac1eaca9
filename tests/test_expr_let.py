"""functions/expr.py::let — the round-11 let-binding refactor.

The binding must change WHERE a value is computed (once, as a bound HOF
lambda variable) and never WHAT is computed: these tests pin the bound
forms of shingles / stopword_ratio / lang_id / duplicated_span_report
against the pre-refactor unbound expressions, re-built inline here, over
an edge-case corpus (NULL, empty, blank, single token, unicode,
stopword-only, long) plus a hypothesis sweep of random strings.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_transform_make_spark.functions.expr import let, optimized_plan
from data_transform_make_spark.functions.text import (
    LANG_STOPWORDS,
    STOPWORDS,
    lang_id,
    quality_score,
    shingles,
    stopword_ratio,
    tokens,
)

EDGE_TEXTS = [
    None,
    "",
    "   ",
    "\t\n ",
    "one",
    "two tokens",
    "the a an of and to in is it that",        # all stopwords
    "der die das und ist",                      # de profile
    "χαίρετε κόσμε unicode Ünïcödé tøkens",
    "a  b   c    d",                            # runs of whitespace
    "x " * 200,                                 # long doc
    "le la les et est le la les et est",
]


def _edge_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "id long, text string"
    )


def _unbound_shingles(col, n=3):
    # the pre-round-11 expression, verbatim (free toks capture)
    toks = tokens(col)
    k = F.size(toks)
    n_sh = F.greatest(k - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n_sh)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(k > 0, sh).otherwise(F.array().cast("array<string>"))


def _unbound_stopword_ratio(col):
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks).cast("double")
    )


def _unbound_lang_id(col):
    toks = tokens(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, words in LANG_STOPWORDS.items():
        score = F.size(F.filter(toks, lambda t: t.isin(*words)))
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def test_bound_forms_identical_on_edge_corpus(spark):
    df = _edge_df(spark)
    out = df.select(
        "id",
        shingles("text").alias("s_new"),
        _unbound_shingles(F.col("text")).alias("s_old"),
        stopword_ratio("text").alias("r_new"),
        _unbound_stopword_ratio(F.col("text")).alias("r_old"),
        lang_id("text").alias("l_new"),
        _unbound_lang_id(F.col("text")).alias("l_old"),
    ).collect()
    for r in out:
        assert r.s_new == r.s_old, (r.id, r.s_new, r.s_old)
        assert r.r_new == r.r_old, (r.id, r.r_new, r.r_old)
        assert r.l_new == r.l_old, (r.id, r.l_new, r.l_old)


def test_let_null_and_nesting_semantics(spark):
    """NULL value reaches the body as NULL (array(NULL) is a one-element
    array holding NULL), and let nests inside other HOF lambdas."""
    df = spark.createDataFrame([(1, None), (2, "a b")], "id long, t string")
    out = df.select(
        "id",
        let(F.col("t"), lambda v: F.when(v.isNull(), "was-null").otherwise(v)).alias("x"),
        # nested: outer let binds the token array, inner transform uses it
        let(
            tokens(F.col("t")),
            lambda toks: F.transform(toks, lambda w: F.concat(w, F.lit("!"))),
        ).alias("y"),
    ).orderBy("id").collect()
    # tokens(NULL) is [] since r14 (the oracle CASE arms always said []
    # — see functions/text.py), so the nested transform yields []
    assert out[0].x == "was-null" and out[0].y == []
    assert out[1].x == "a b" and out[1].y == ["a!", "b!"]


def test_span_report_matches_python_reference_on_edges(spark):
    """duplicated_span_report's let-bound spans/totals legs against a
    direct Python span computation over the edge corpus."""
    from data_transform_make_spark.operators.dedup import (
        duplicated_span_report,
    )

    window = 3
    df = _edge_df(spark).filter("text is not null")
    got = {
        r["id"]: r["n_spans"]
        for r in duplicated_span_report(df, "id", "text", window=window)
        .select(F.col("id"), "n_spans").collect()
    }
    rows = {r.id: r.text for r in df.collect()}
    for i, t in rows.items():
        toks = t.strip().lower().split() if t.strip() else []
        expect = max(len(toks) - window + 1, 0)
        if expect > 0:
            assert got[i] == expect, (i, got[i], expect)
        else:
            assert i not in got  # zero-span docs are filtered


def test_bound_forms_identical_property(spark):
    """Hypothesis sweep: bound == unbound over random whitespace/stopword/
    unicode soup (the cosine-contract test's fixture-in-closure pattern —
    @given can't take pytest fixtures directly)."""

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.sampled_from("ab cd\tthe und le χ!.8 "),
                max_size=60,
            ),
            min_size=1,
            max_size=6,
        )
    )
    def check(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
        out = df.select(
            shingles("text").alias("s_new"),
            _unbound_shingles(F.col("text")).alias("s_old"),
            stopword_ratio("text").alias("r_new"),
            _unbound_stopword_ratio(F.col("text")).alias("r_old"),
            lang_id("text").alias("l_new"),
            _unbound_lang_id(F.col("text")).alias("l_old"),
            quality_score("text").alias("q"),
        ).collect()
        for r in out:
            assert r.s_new == r.s_old
            assert r.r_new == r.r_old
            assert r.l_new == r.l_old
            assert r.q is not None  # quality is total over strings

    check()


def test_let_binding_survives_the_optimizer(spark):
    """Round-11 plan pin (the vv-hoist-pin pattern): the optimized plan
    of a let-bound expression must evaluate the bound value ONCE. A
    future Catalyst rewrite like transform(array(x), f)[0] -> f(x) would
    inline x into every reference and silently undo the whole binding
    (shingles back to one tokenization per emitted shingle). The bound
    shingles plan must contain exactly one split(); the unbound control
    shows three."""
    df = spark.createDataFrame([(1, "a b c d")], "id long, text string")
    plan = optimized_plan(df.select(shingles("text").alias("s")))
    assert plan.count("split(") == 1, (
        "the let binding was optimized away — shingles re-tokenizes per "
        "reference again on this Spark version (functions/expr.py)"
    )
    control = optimized_plan(
        df.select(_unbound_shingles(F.col("text")).alias("s"))
    )
    assert control.count("split(") > 1  # the disease the pin guards against
