from .ingest import ingest_with_reason, parse_with_dead_letter
from .loader import TABLES, load_table, load_tables, register_views
from .observability import observe_counts, observed_ingest_metrics
from .sinks import (
    compact_small_files,
    merge_upsert,
    merge_upsert_path,
    write_bucketed,
    write_jsonl,
    write_partitioned,
    write_sorted,
    write_zordered,
)

__all__ = [
    "ingest_with_reason",
    "parse_with_dead_letter",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "observe_counts",
    "observed_ingest_metrics",
    "compact_small_files",
    "merge_upsert",
    "merge_upsert_path",
    "write_bucketed",
    "write_jsonl",
    "write_partitioned",
    "write_sorted",
    "write_zordered",
]
