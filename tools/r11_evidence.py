"""Round-11 evidence runs, ONE process, run ALONE (the r10_evidence model).

Reproduces this round's four measurement decisions (SCALE.md "Round-11
evidence"), all same-session interleaved, min-of-N:

1. cosine guard shapes — pre-guard (2 refs) / naive Inf-guards (5 refs) /
   shipped single-fold — brute-force top-k over sf0.1 embeddings. The
   naive form re-runs interpreted HOF folds per extra reference (the
   caught-in-round regression); the shipped fold must sit at pre-guard
   cost. All three must return identical rows.
2. IVF assignment with the centroid-independent dot(v,v) inlined
   (K redundant folds/row) vs let through a materialized column
   (shipped). Identical assignments required.
3. shingles with the tokenize subtree FREE-CAPTURED inside the
   per-window transform lambda (re-evaluated per emitted shingle — the
   pre-r11 form) vs the shipped let-bound form: (a) one input partition
   (per-core map cost, the number that matters at 100 TB) and (b) the
   end-to-end quality+shingle projection at sf1.0 if scale_sf1 exists.
4. bm25 base projection struct-let (REJECTED candidate): references at
   a HOF's argument position are codegen-CSE'd; the struct only adds
   overhead. Kept as the negative control for the lens.

Prints one JSON line prefixed R11_EVIDENCE_RESULT:.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_transform_make_spark.functions.expr import let  # noqa: E402
from data_transform_make_spark.functions.text import (  # noqa: E402
    quality_score,
    shingles,
    tokens,
)
from data_transform_make_spark.functions.vectors import (  # noqa: E402
    cosine_similarity,
    dot,
    l2_norm,
)
from data_transform_make_spark.operators.similarity import (  # noqa: E402
    assign_ivf_cluster,
)
from data_transform_make_spark.session import get_spark  # noqa: E402
from data_transform_make_spark.sources.loader import load_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_sf1"
)


def _min_of(f, n=6):
    f()  # warmup
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


# --- pre-r11 expression forms, verbatim, for the A/B reference side ---

def _cos_preguard(a, b):
    denom = l2_norm(a) * l2_norm(b)
    sim = dot(a, b) / denom
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(
        F.when(F.isnan(sim), F.lit(None).cast("double")).otherwise(sim)
    )


def _cos_naive_guards(a, b):
    inf = F.lit(float("inf"))
    denom = l2_norm(a) * l2_norm(b)
    sim = dot(a, b) / denom
    nf = F.isnan(sim) | (denom == inf) | (sim == inf) | (sim == -inf)
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(
        F.when(nf, F.lit(None).cast("double")).otherwise(sim)
    )


def _shingles_unbound(col, n=3):
    toks = tokens(col)
    k = F.size(toks)
    n_sh = F.greatest(k - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n_sh)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(k > 0, sh).otherwise(F.array().cast("array<string>"))


def main() -> None:
    spark = get_spark("r11-evidence")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    # 1. cosine guard shapes
    emb = load_table(spark, SF01, "embeddings")
    q = emb.filter("vec_id = 0").select("embedding").first()[0]
    qlit = F.array(*[F.lit(float(x)) for x in q])

    def topk(cos):
        return (
            emb.select("vec_id", cos(F.col("embedding"), qlit).alias("c"))
            .orderBy(F.desc_nulls_last("c"), "vec_id")
            .limit(10)
        )

    rows = {
        name: [tuple(r) for r in topk(cos).collect()]
        for name, cos in [
            ("preguard", _cos_preguard),
            ("naive", _cos_naive_guards),
            ("fold", cosine_similarity),
        ]
    }
    assert rows["preguard"] == rows["naive"] == rows["fold"]
    out["cosine"] = {
        name: _min_of(lambda c=cos: topk(c).collect())
        for name, cos in [
            ("preguard", _cos_preguard),
            ("naive", _cos_naive_guards),
            ("fold", cosine_similarity),
        ]
    }

    # 2. IVF assignment: inlined vv vs materialized column
    dim = emb.select(F.size("embedding")).first()[0]
    cent = [
        [float((i * 7 + j * 3) % 13) / 13.0 for j in range(dim)]
        for i in range(16)
    ]
    big = (
        emb.crossJoin(spark.range(25).select(F.col("id").alias("__r")))
        .select("vec_id", "embedding")
        .localCheckpoint()
    )

    def assign_inline():
        return (
            big.withColumn(
                "__c", assign_ivf_cluster(F.col("embedding"), cent)
            )
            .groupBy("__c")
            .count()
        )

    def assign_mat():
        return (
            big.withColumn("__vv", dot(F.col("embedding"), F.col("embedding")))
            .withColumn(
                "__c",
                assign_ivf_cluster(
                    F.col("embedding"), cent, vv=F.col("__vv")
                ),
            )
            .groupBy("__c")
            .count()
        )

    a = sorted(tuple(r) for r in assign_inline().collect())
    b = sorted(tuple(r) for r in assign_mat().collect())
    assert a == b
    out["ivf_vv"] = {
        "inline": _min_of(lambda: assign_inline().collect(), 4),
        "materialized": _min_of(lambda: assign_mat().collect(), 4),
    }

    # 3. shingles capture: per-core (1 partition) and sf1.0 end-to-end
    docs1p = load_table(spark, SF01, "documents").coalesce(1).localCheckpoint()

    def sh_run(fn, frame):
        return (
            frame.select(F.sum(F.size(F.array_distinct(fn("text")))))
            .collect()
        )

    assert sh_run(shingles, docs1p) == sh_run(_shingles_unbound, docs1p)
    out["shingles_1part"] = {
        "unbound": _min_of(lambda: sh_run(_shingles_unbound, docs1p), 3),
        "bound": _min_of(lambda: sh_run(shingles, docs1p), 3),
    }
    if os.path.isdir(SF1):
        big_docs = load_table(spark, SF1, "documents").localCheckpoint()

        def gate(fn):
            return (
                big_docs.filter(quality_score("text") >= 0.66)
                .select(F.sum(F.size(F.array_distinct(fn("text")))))
                .collect()
            )

        assert gate(shingles) == gate(_shingles_unbound)
        out["shingles_sf1_gate"] = {
            "unbound": _min_of(lambda: gate(_shingles_unbound), 3),
            "bound": _min_of(lambda: gate(shingles), 3),
        }

    # 4. bm25 struct-let negative control
    docs = load_table(spark, SF01, "documents").repartition(32).localCheckpoint()
    terms = ["the", "data", "model", "training"]

    def _eq(t):
        lit = F.lit(t)
        return lambda x: x == lit

    tk = F.coalesce(tokens(F.col("text")), F.array().cast("array<string>"))

    def base_current():
        tfs = [
            F.size(F.filter(tk, _eq(t))).cast("long").alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ]
        return docs.select("doc_id", F.size(tk).cast("long").alias("dl"), *tfs)

    def base_bound():
        def body(toks):
            return F.struct(
                F.size(toks).cast("long").alias("dl"),
                *[
                    F.size(F.filter(toks, _eq(t))).cast("long").alias(f"tf{i}")
                    for i, t in enumerate(terms)
                ],
            )

        mid = docs.select("doc_id", let(tk, body).alias("__s"))
        return mid.select(
            "doc_id",
            F.col("__s.dl").alias("dl"),
            *[F.col(f"__s.tf{i}").alias(f"__tf_{i}") for i in range(len(terms))],
        )

    agg = lambda b: b.agg(  # noqa: E731
        F.sum("dl"), *[F.sum(f"__tf_{i}") for i in range(len(terms))]
    ).collect()
    assert agg(base_current()) == agg(base_bound())
    out["bm25_structlet"] = {
        "current": _min_of(lambda: agg(base_current()), 4),
        "structlet": _min_of(lambda: agg(base_bound()), 4),
    }

    print("R11_EVIDENCE_RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
