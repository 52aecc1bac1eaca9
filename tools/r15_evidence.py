"""Round-15 evidence probes, re-runnable (the r10-r13 evidence-tool
pattern): every disposition the round recorded in SCALE.md is backed by
a probe the judge can re-execute. Three sections, each printing labeled
lines; run all (~6 min) or name sections as args.

  spans   — the ll2/ll3 codegen-span read repeated twice, plus the
            plan-diff evidence: whether the executed plan carries the
            extra Exchange above the localCheckpoint's Scan ExistingRDD.
            The 6<->7 flip is RUN-TO-RUN (this tool's own first run
            caught ll3 reading [6, 7] within ONE session — the original
            "stable in-session" framing was too strong), which is why
            the audit pins the range instead of a value.
  ch1     — the ch1 cold/warm A/B: the r13 body (re-tokenize per chunk,
            ==0 guard) reconstructed inline, identity-asserted against
            the shipped r14 body (count + xxhash-sum at sf0.1), then both
            timed (first post-warmup count = the bench's cold read;
            min-of-3 warm). One invocation = one session = one PAIR of
            cells; interleave fresh invocations for the A/B series
            (SCALE.md r15: r14 body cold x0.96 / warm x0.96 — noise).
  st3ab   — the streaming Python-boundary A/B: st3's running (n, cents)
            fold as a NATIVE update-mode streaming aggregation,
            identity-asserted (all users, exact) against the shipped
            applyInPandasWithState form, then min-of-3 timed at sf0.1
            and (if scale_sf1 exists) sf1.0. SCALE.md r15: native wins
            x1.17 -> x1.45, widening with state keys.
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.01"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_sf1"
)


def probe_spans(spark) -> None:
    from data_transform_make_spark import corpus
    from data_transform_make_spark.functions.expr import executed_plan

    qs = corpus.queries()
    for name in ("ll2_training_corpus_clustered", "ll3_training_corpus_capped"):
        reads = []
        exchanges = []
        for _ in range(2):
            df = qs[name](spark, SF001, eager=False)
            df.collect()
            plan = executed_plan(df)
            reads.append(len(set(re.findall(r"codegen id : (\d+)", plan))))
            # the 7-span variant's signature: AQE re-shuffles the
            # localCheckpoint scan's output. Detect it in the TREE section
            # by indentation: an AQEShuffleRead whose subtree (strictly
            # deeper indent until the next node at <= its depth) contains
            # the Scan ExistingRDD — i.e. the re-shuffle is the scan's
            # ancestor in dataflow, not merely the previous detail line
            # (detail blocks are node-number-ordered, not adjacency-
            # ordered; ADVICE r15).
            tree = []
            for ln in plan.splitlines():
                # tree-section lines: indent glyphs, op name, "(N)" at end
                m = re.match(r"^([ :+*-]*)([A-Za-z].*)\((\d+)\)\s*$", ln)
                if m:
                    tree.append((len(m.group(1)), m.group(2).strip()))
                elif tree and not ln.strip():
                    break  # tree section ends at the first blank line
            reshuffled = False
            for i, (d, op) in enumerate(tree):
                if op.startswith("AQEShuffleRead"):
                    for d2, op2 in tree[i + 1 :]:
                        if d2 <= d:
                            break  # left the AQEShuffleRead's subtree
                        if "Scan ExistingRDD" in op2:
                            reshuffled = True
            exchanges.append(reshuffled)
        print(
            f"SPANS {name}: reads {reads} "
            f"(each 6 or 7; run-to-run variation is the finding); "
            f"checkpoint-scan re-shuffled per read: {exchanges} "
            f"(True <=> the 7-span variant)"
        )


def probe_ch1(spark) -> None:
    from pyspark.sql import functions as F

    from data_transform_make_spark import corpus
    from data_transform_make_spark.functions.text import tokens
    from data_transform_make_spark.operators.dedup import _spread
    from data_transform_make_spark.sources.loader import load_table

    def ch1_r13_body(sf_dir):
        # byte-faithful reconstruction of operators/chunking.py@efbaa84
        docs = load_table(spark, sf_dir, "documents")
        chunk_size, stride = 64, 48
        toks = tokens(F.col("text"))
        starts = F.when(
            F.size(toks) == 0, F.array().cast("array<int>")
        ).otherwise(F.sequence(F.lit(1), F.size(toks), F.lit(stride)))
        ex = _spread(docs, "doc_id").select(
            F.col("doc_id"),
            F.col("text"),
            F.posexplode(starts).alias("chunk_idx", "__start"),
        )
        chunk = F.slice(tokens(F.col("text")), F.col("__start"), chunk_size)
        return ex.select(
            F.col("doc_id"),
            F.col("chunk_idx").cast("int"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
            F.size(chunk).cast("long").alias("n_tokens"),
        )

    qs = corpus.queries()
    qs["p1_status_gate"](spark, SF01).count()  # the bench's warmup
    a = qs["ch1_doc_chunks"](spark, SF01)
    b = ch1_r13_body(SF01)
    ha = a.agg(F.sum(F.xxhash64(*a.columns).cast("decimal(38,0)"))).collect()[0][0]
    hb = b.agg(F.sum(F.xxhash64(*b.columns).cast("decimal(38,0)"))).collect()[0][0]
    ident = a.count() == b.count() and ha == hb
    print(f"CH1 identity r13-vs-r14 body: {ident}")
    assert ident
    for tag, fn in (("r14", lambda: qs["ch1_doc_chunks"](spark, SF01)),
                    ("r13", lambda: ch1_r13_body(SF01))):
        t0 = time.perf_counter()
        fn().count()
        cold = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn().count()
            runs.append(time.perf_counter() - t0)
        print(f"CH1 body={tag} first-read={cold} warm={round(min(runs), 3)} "
              "(cells comparable only across interleaved fresh sessions)")


def probe_st3ab(spark) -> None:
    from data_transform_make_spark import corpus
    from data_transform_make_spark.streaming import pipelines as P

    qs = corpus.queries()

    # r16: the native form is now the shipped first-class API (r15
    # verdict item 2) — the probe times the function users call, so the
    # A/B can't drift from the product.
    def jvm_counters(sf_dir):
        return P.streaming_counters_native(spark, sf_dir)

    a = {
        r.user_id: (r.n, r.total_cents)
        for r in qs["st3_stream_stateful_counters"](spark, SF01).collect()
    }
    b = {r.user_id: (r.n, r.total_cents) for r in jvm_counters(SF01).collect()}
    print(f"ST3AB identity arrow-vs-native: {a == b} ({len(a)} users)")
    assert a == b

    def min3(f):
        f()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    sfs = [(SF01, "sf0.1")] + ([(SF1, "sf1.0")] if os.path.isdir(SF1) else [])
    for sfd, tag in sfs:
        t_arrow = min3(
            lambda: qs["st3_stream_stateful_counters"](spark, sfd).count()
        )
        t_jvm = min3(lambda: jvm_counters(sfd).count())
        print(
            f"ST3AB {tag}: arrow={t_arrow} native={t_jvm} "
            f"native-speedup x{round(t_arrow / t_jvm, 2)}"
        )


def main() -> None:
    from data_transform_make_spark.session import get_spark

    sections = sys.argv[1:] or ["spans", "ch1", "st3ab"]
    spark = get_spark("r15-evidence")
    if "spans" in sections:
        probe_spans(spark)
    if "ch1" in sections:
        probe_ch1(spark)
    if "st3ab" in sections:
        probe_st3ab(spark)
    spark.stop()


if __name__ == "__main__":
    main()
