"""Exploratory probe (r13): Spark vs DuckDB on lower/trim/\\s+ beyond
ASCII — the text-oracle convention (doc_fingerprint / tokens twins) is
proven green on the ASCII fixture; this measures where the two engines'
Unicode semantics actually agree or diverge. Not part of the gate;
findings land in SCALE.md / a pytest pin."""
import sys

sys.path.insert(0, ".")
import duckdb  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from data_transform_make_spark.session import get_spark  # noqa: E402

cases = [
    ("ascii", "Hello  World"),
    ("turkish_I", "Iİ iı"),  # I, dotted-I, i, dotless-i
    ("sharp_s", "STRAßE straße"),
    ("nbsp_sep", "a b"),
    ("fullwidth_sp", "a　b"),
    ("combining", "éclair"),
    ("greek_final_sigma", "ΣΟΦΟΣ"),
    ("astral_math_bold", "\U0001d400bc"),
    ("tab_nl", " a\tb\nc "),
    ("vertical_tab", "a\x0bb"),
    ("zero_width_space", "a​b"),
    ("unit_separator", "a\x1fb"),
]


def main() -> None:
    spark = get_spark("uniprobe", cpus=2)
    df = spark.createDataFrame(cases, "name string, text string")
    out = df.select(
        "name",
        F.lower("text").alias("lo"),
        F.trim(F.lower("text")).alias("tl"),
        F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")).alias(
            "fp"
        ),
        F.split(F.trim(F.lower("text")), r"\s+").alias("toks"),
        F.regexp_count(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        ).alias("ntok"),
    ).collect()
    con = duckdb.connect()
    text_by_name = dict(cases)
    diffs = 0
    for r in out:
        text = text_by_name[r["name"]]
        d = con.execute(
            "SELECT lower(?), trim(lower(?)),"
            " md5(regexp_replace(trim(lower(?)), '\\s+', ' ', 'g')),"
            " regexp_split_to_array(trim(lower(?)), '\\s+'),"
            " len(regexp_extract_all(?, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))",
            [text] * 5,
        ).fetchone()
        for k, a, b in [
            ("lower", r["lo"], d[0]),
            ("trimlower", r["tl"], d[1]),
            ("fingerprint", r["fp"], d[2]),
            ("tokens", r["toks"], d[3]),
            ("ntok", r["ntok"], d[4]),
        ]:
            if a != b:
                diffs += 1
                print(f"DIVERGE {r['name']}/{k}: spark={a!r} duck={b!r}")
    print("total divergences:", diffs)
    spark.stop()


if __name__ == "__main__":
    main()
