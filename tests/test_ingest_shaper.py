"""Golden test for transformToSimpleRecords + combineEmbroideryInfo
(makeRouter.js:40-75) — byte-exact text blob, `|| ""` defaults, casts."""

import pyspark.sql.types as T

from data_transform_make_spark.plans.ingest_shaper import transform_to_simple_records

META_ENTRY = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("scalar", T.StringType()),
        T.StructField("group", T.MapType(T.StringType(), T.StringType())),
    ]
)
ITEM = T.StructType(
    [
        T.StructField("productId", T.StringType()),
        T.StructField("Name", T.StringType()),
        T.StructField("Quantity", T.LongType()),
        T.StructField("Subtotal", T.DoubleType()),
        T.StructField("Total", T.DoubleType()),
        T.StructField("MetaData", T.ArrayType(META_ENTRY)),
    ]
)
SCHEMA = T.StructType([T.StructField("order", T.ArrayType(ITEM))])


def test_transform_to_simple_records(spark):
    meta = [
        ("Color Selection", "Red", None),
        ("Wheel Type", "", None),               # falsy scalar -> "" default
        ("Embroidery Front", None, {"Position": "Front", "Text": "ACME", "Font": "No"}),
        ("Embroidery Back", None, {"Position": "Back", "Thread": "Gold"}),
        ("Not A Group", None, {"Size": "L"}),   # no Position -> excluded
    ]
    rows = [([("P1", "Tote", 2, 10.5, 21.0, meta), ("P2", "Mini", 1, 3.0, 3.0, [])],)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = transform_to_simple_records(df).orderBy("line_no").collect()
    r0, r1 = out

    assert r0.product_id == "P1"
    assert r0.bag_lookup_website == "P1 - Red"
    assert r0.bag_color_website == "Red"
    assert r0.qty_website == "2"
    assert r0.rate_website == 10.5
    assert r0.total_website == 21.0
    assert r0.wheel_option_website == ""  # '' || '' -> ''
    assert r0.logo_website == ""          # missing key -> ''
    # combineEmbroideryInfo: groups in insertion order, 'No' values skipped,
    # blank line between groups, trimmed.
    expected = (
        "Embroidery Front:\n"
        "  Position: Front\n"
        "  Text: ACME\n"
        "\n"
        "Embroidery Back:\n"
        "  Position: Back\n"
        "  Thread: Gold"
    )
    assert r0.order_details_website == expected

    assert r1.product_id == "P2"
    assert r1.bag_color_website == ""
    assert r1.order_details_website == ""
    assert r1.qty_website == "1"


def test_parse_with_dead_letter_routes_malformed(spark):
    """Regression: PERMISSIVE from_json yields a null-field struct (not a
    null struct) for malformed bodies — routing must use _corrupt_record."""
    from data_transform_make_spark.sources.ingest import parse_with_dead_letter

    rows = [
        (1, '{"k": 7}'),            # valid
        (2, '  {"k": 8}\x00 '),     # valid after sanitize (server.js:25)
        (3, "{bad"),                # malformed -> 400 path
        (4, ""),                    # empty -> '{}' -> valid, k null
        (5, "\t\n  \t"),            # whitespace-only: JS .trim() -> '' -> '{}'
        (6, '\n\t{"k": 9}\r\n'),    # tab/newline-wrapped valid JSON
        (7, "\u00a0\ufeff\u2028"),  # Unicode ws only: JS .trim() -> '' -> '{}'
        (8, '\u00a0{"k": 10}\u3000'),  # NBSP/ideographic-space-wrapped valid
    ]
    df = spark.createDataFrame(rows, "id long, raw_body string")
    schema = T.StructType([T.StructField("k", T.LongType())])
    res = parse_with_dead_letter(df, schema)
    parsed = {r.id: r.record.k for r in res.parsed.collect()}
    dead = {r.id: r.reject_reason for r in res.dead_letter.collect()}
    assert parsed == {1: 7, 2: 8, 4: None, 5: None, 6: 9, 7: None, 8: 10}
    assert dead == {3: "invalid_json"}


def test_oversize_cap_applies_to_raw_body_pre_trim(spark):
    """The 5 MB cap is express.text's REQUEST-size limit (server.js:11):
    it rejects on the raw body before any middleware trims it. A >5 MB
    whitespace-padded payload must dead-letter as payload_too_large, not
    trim its way under the cap (review, round 8 — the flag previously
    read the sanitized column)."""
    from data_transform_make_spark.sources.ingest import (
        MAX_BODY_BYTES,
        parse_with_dead_letter,
    )

    pad = " " * (MAX_BODY_BYTES + 10)
    rows = [
        (1, pad + '{"k": 7}'),   # raw >5MB, trims to tiny valid JSON
        (2, '{"k": 8}'),         # control: small valid body
    ]
    df = spark.createDataFrame(rows, "id long, raw_body string")
    schema = T.StructType([T.StructField("k", T.LongType())])
    res = parse_with_dead_letter(df, schema)
    assert {r.id: r.reject_reason for r in res.dead_letter.collect()} == {
        1: "payload_too_large"
    }
    assert {r.id: r.record.k for r in res.parsed.collect()} == {2: 8}
    # ADVICE r8: the oversize row's sanitize/parse subtree is skipped —
    # its body rides through RAW (payload preserved as received), while
    # parsed-leg bodies are still the sanitized form
    dead_rows = {r.id: r.raw_body for r in res.dead_letter.collect()}
    assert dead_rows[1] == pad + '{"k": 7}'


def test_observed_ingest_metrics_piggyback_the_action(spark):
    """S8 observability: the request-log counters ride the SAME pass as
    the consuming action (df.observe) — values match a hand count, and
    they are available right after the action with no separate count
    jobs."""
    from data_transform_make_spark.sources.ingest import ingest_with_reason
    from data_transform_make_spark.sources.observability import (
        observed_ingest_metrics,
    )

    rows = [
        (1, '{"k": 7}'),
        (2, "{bad"),
        (3, ""),
        (4, "x" * (5 * 1024 * 1024 + 1)),  # over the 5 MB cap
        (5, '{"k": 9}'),
    ]
    df = spark.createDataFrame(rows, "id long, raw_body string")
    schema = T.StructType([T.StructField("k", T.LongType())])
    tagged = ingest_with_reason(df, schema)
    observed, obs = observed_ingest_metrics(tagged)

    out = observed.collect()  # the ONE action; metrics ride along
    assert len(out) == 5
    got = obs.get
    assert got == {
        "n_requests": 5,
        "n_parsed": 3,  # ids 1, 3 (empty -> '{}'), 5
        "n_too_large": 1,
        "n_invalid_json": 1,
    }


def test_observe_counts_generic(spark):
    from pyspark.sql import functions as F

    from data_transform_make_spark.sources.observability import observe_counts

    df = spark.createDataFrame([(i,) for i in range(10)], "x long")
    observed, obs = observe_counts(
        df, "demo", n=F.count(F.lit(1)), evens=F.count(F.when(F.col("x") % 2 == 0, True))
    )
    assert observed.count() == 10
    assert obs.get == {"n": 10, "evens": 5}


def test_observe_streaming_metrics_per_microbatch(spark, tmp_path):
    """Streaming S8: Observation objects are rejected on streaming
    Datasets (observe_counts raises a directing TypeError); the
    name-based observe_streaming form surfaces the counters in the
    query's progress observedMetrics."""
    import pytest
    from pyspark.sql import functions as F

    from data_transform_make_spark.sources.observability import (
        observe_counts,
        observe_streaming,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "x" * (i % 3)) for i in range(10)], "id long, s string"
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, s string").parquet(src)

    with pytest.raises(TypeError):
        observe_counts(stream, "nope", n=F.count(F.lit(1)))

    observed = observe_streaming(
        stream,
        "ingest_stream",
        n=F.count(F.lit(1)),
        blanks=F.count(F.when(F.length("s") == 0, True)),
    )
    q = (
        observed.writeStream.format("memory")
        .queryName("obs_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    metrics = [
        p["observedMetrics"]["ingest_stream"]
        for p in (q.recentProgress or [])
        if "ingest_stream" in (p.get("observedMetrics") or {})
    ]
    q.stop()
    assert sum(m["n"] for m in metrics) == 10
    assert sum(m["blanks"] for m in metrics) == 4  # i % 3 == 0 -> 0,3,6,9
