"""Generate the sf1.0-scale documents table for the ll1/ll2/ll3 scaling
measurement (r7 verdict #3): 10x the sf0.1 corpus, built so the WORKLOAD
scales 10x while its shape (duplicate rate, quality-gate keep rate, skew
profile) is preserved.

Construction: replica 0 is the sf0.1 table verbatim; replicas 1..9 remap
every NON-stopword token t -> t + "xq<i>" (letters only — the underscore
is in quality_score's punctuation class) and shift doc_ids into disjoint
ranges. Properties, by design:

- token/whitespace structure unchanged -> word_count, token structure,
  and stopword_ratio are IDENTICAL per replica (stopwords untouched,
  token count unchanged), so the quality gate's stop_ok is preserved
  exactly; len_ok/punct_ok drift only for docs within ~4 chars/token of
  a threshold (measured below; the fixture range 44..577 chars sits far
  from the 5000-char band edge).
- each replica's token vocabulary is disjoint from every other's except
  the stopwords themselves, so k>=2 shingles are shared across replicas
  only when ALL k tokens are stopwords — with the fixture vocabulary
  that is essentially never. The near-dup pair graph is therefore 10
  disjoint isomorphic copies of the sf0.1 graph: pairs x10, components
  x10, per-shingle posting sizes unchanged — a genuinely 10x-scaled
  workload with the same skew profile, not a pair-count explosion.

Output: /root/repo/scale_sf1/documents.parquet (+ symlinks for the other
tables so load_table() works unchanged against the directory). Writes
ONLY under /root/repo. Deterministic; no RNG.
"""
import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_transform_make_spark.functions.text import STOPWORDS  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_sf1")
REPLICAS = 10
ID_STRIDE = 1_000_000

_TOKEN = re.compile(r"\S+")
_STOP = set(STOPWORDS)


def remap(text: str, i: int) -> str:
    suffix = f"xq{i}"
    return _TOKEN.sub(
        lambda m: m.group(0) if m.group(0).lower() in _STOP else m.group(0) + suffix,
        text,
    )


def main() -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    rows = t.to_pylist()
    out = []
    for i in range(REPLICAS):
        for r in rows:
            if i == 0:
                out.append(r)
            else:
                txt = remap(r["text"], i)
                out.append(
                    {
                        "doc_id": r["doc_id"] + i * ID_STRIDE,
                        "text": txt,
                        "lang": r["lang"],
                        "source": r["source"],
                        "n_chars": len(txt),
                    }
                )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(out, schema=schema), os.path.join(OUT_DIR, "documents.parquet"))

    # embeddings x10 for the similarity-family scaling rows: replica i
    # shifts vec_ids into a disjoint range and ROTATES each vector by i
    # positions — deterministic, norm-preserving (cosine structure within
    # each replica is isomorphic to the original), replica 0 verbatim so
    # the n1/n2 query vector (vec_id=0) is unchanged.
    et = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pylist()
    eout = []
    for i in range(REPLICAS):
        for r in et:
            if i == 0:
                eout.append(r)
            else:
                v = r["embedding"]
                eout.append(
                    {
                        "vec_id": r["vec_id"] + i * ID_STRIDE,
                        "embedding": v[i:] + v[:i],
                        "label": r["label"],
                    }
                )
    eschema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    edst = os.path.join(OUT_DIR, "embeddings.parquet")
    if os.path.islink(edst):
        os.remove(edst)
    pq.write_table(pa.Table.from_pylist(eout, schema=eschema), edst)

    # relational facts x10 (round 9 — the relational-core scaling tier):
    # replica i shifts the FACT keys into disjoint ranges while the
    # DIMENSION tables stay fixed — the standard warehouse scaling shape
    # (10x orders per customer, 10x lineitems per part/supplier). Shifts:
    #   orders.o_orderkey / lineitem.l_orderkey += i * 10_000_000
    #     (FK-consistent; above the sf0.1 max key 149_999)
    #   events.event_id += i * 9_700_000 — a multiple of 50*97, so the
    #     i1 corrupt/blank body patterns (event_id % 50 / % 97) replicate
    #     EXACTLY per replica and the ingest legs scale 10.00x
    #   events.user_id += i * 10_000 — disjoint user universes, so
    #     sessionization/as-of structure is 10 isomorphic copies, not
    #     10x-denser per-user streams (which would MERGE sessions)
    # Vectorized pyarrow column arithmetic — never to_pylist on 6M rows.
    import pyarrow.compute as pc

    def _replicate(name: str, shifts: dict[str, int]) -> int:
        t10 = pq.read_table(os.path.join(SRC, name))
        parts = []
        for i in range(REPLICAS):
            t_i = t10
            for col, stride in shifts.items():
                idx = t_i.schema.get_field_index(col)
                shifted = pc.add(t_i.column(col), pa.scalar(i * stride, t_i.schema.field(col).type))
                t_i = t_i.set_column(idx, t_i.schema.field(col), shifted)
            parts.append(t_i)
        full = pa.concat_tables(parts)
        dst = os.path.join(OUT_DIR, name)
        if os.path.islink(dst):
            os.remove(dst)
        pq.write_table(full, dst)
        return full.num_rows

    n_orders = _replicate("orders.parquet", {"o_orderkey": 10_000_000})
    n_lines = _replicate("lineitem.parquet", {"l_orderkey": 10_000_000})
    n_events = _replicate(
        "events.parquet", {"event_id": 9_700_000, "user_id": 10_000}
    )

    # the dimension tables are untouched at this scale point; symlink them
    # so load_table(spark, OUT_DIR, name) resolves for every table name
    for name in os.listdir(SRC):
        dst = os.path.join(OUT_DIR, name)
        if name not in (
            "documents.parquet",
            "embeddings.parquet",
            "orders.parquet",
            "lineitem.parquet",
            "events.parquet",
        ) and not os.path.lexists(dst):
            os.symlink(os.path.join(SRC, name), dst)
    print(
        f"wrote {len(out)} docs + {len(eout)} embeddings + "
        f"{n_orders} orders + {n_lines} lineitems + {n_events} events -> {OUT_DIR}/"
    )


if __name__ == "__main__":
    main()
