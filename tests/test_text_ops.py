"""Unit tests for the round-5 text operators: repetition stats, PII
redaction, and tf/df keyword extraction."""

import pytest
from pyspark.sql import functions as F


class TestRepetition:
    def test_fully_repetitive_doc(self, spark):
        # "a a a a a" -> 2-grams: ["a a"] x4 -> top fraction 1.0
        from data_transform_make_spark.functions.text import shingles

        docs = spark.createDataFrame(
            [(1, "a a a a a"), (2, "w x y z q")], "doc_id long, text string"
        )
        sh = docs.select("doc_id", F.explode(shingles("text", 2)).alias("s"))
        counts = sh.groupBy("doc_id", "s").count()
        got = {
            r["doc_id"]: (r["mx"], r["tot"])
            for r in counts.groupBy("doc_id")
            .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
            .collect()
        }
        assert got[1] == (4, 4)  # one distinct 2-gram, 4 occurrences
        assert got[2] == (1, 4)  # all distinct


class TestPiiRedaction:
    def _one(self, spark, text):
        from data_transform_make_spark.functions.text import pii_counts, redact_pii

        df = spark.createDataFrame([(text,)], "t string")
        ne, np_ = pii_counts("t")
        row = df.select(
            ne.alias("e"), np_.alias("p"), redact_pii("t").alias("r")
        ).collect()[0]
        return row["e"], row["p"], row["r"]

    def test_email_and_phone(self, spark):
        e, p, r = self._one(
            spark, "write a.b+c@mail.example.org or dial 123-456-7890 now"
        )
        assert (e, p) == (1, 1)
        assert r == "write <EMAIL> or dial <PHONE> now"

    def test_multiple_occurrences_all_replaced(self, spark):
        e, p, r = self._one(spark, "x@y.io then z@w.co then 111-222-3333 111-222-3333")
        assert (e, p) == (2, 2)
        assert "<EMAIL>" in r and "@" not in r
        assert r.count("<PHONE>") == 2

    def test_clean_text_untouched(self, spark):
        e, p, r = self._one(spark, "no personal data here at all")
        assert (e, p, r) == (0, 0, "no personal data here at all")


class TestKeywordTopK:
    def test_rare_term_outranks_common(self, spark):
        from data_transform_make_spark.operators.keywords import tfidf_topk_terms

        # "zebra" appears only in doc 1 (df=1); "the" is in all docs (df=3).
        docs = spark.createDataFrame(
            [
                (1, "the zebra the zebra"),
                (2, "the cat sat"),
                (3, "the dog ran"),
            ],
            "doc_id long, text string",
        )
        out = tfidf_topk_terms(docs, "doc_id", "text", k=2)
        top1 = {
            r["doc_id"]: r["term"] for r in out.filter("rnk = 1").collect()
        }
        assert top1[1] == "zebra"  # tf=2/df=1 = 2.0 beats the's 2/3
        # per-doc output capped at k, ranking dense from 1
        rows = out.filter("doc_id = 1").orderBy("rnk").collect()
        assert [r["rnk"] for r in rows] == [1, 2]

    def test_tie_breaks_by_term_ascending(self, spark):
        from data_transform_make_spark.operators.keywords import tfidf_topk_terms

        docs = spark.createDataFrame(
            [(1, "bb aa"), (2, "cc dd")], "doc_id long, text string"
        )
        # every term: tf=1, df=1 -> identical score; order must be lexical
        rows = tfidf_topk_terms(docs, "doc_id", "text", k=2).collect()
        got = {(r["doc_id"], r["rnk"]): r["term"] for r in rows}
        assert got[(1, 1)] == "aa" and got[(1, 2)] == "bb"
        assert got[(2, 1)] == "cc" and got[(2, 2)] == "dd"
