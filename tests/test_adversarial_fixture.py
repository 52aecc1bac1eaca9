"""Documents-family queries on the HOSTILE fixture, per-suite.

tools/adversarial_sim.py appends adversarial documents (NULL text,
empty, space-only, tab-only, newline/tab-edged, a whitespace dup pair)
to the sf0.001 fixture and runs oracle-twinned queries through BOTH
engines on the same parquet. The full run (all 100 twins) is a tool;
this test pins the documents-family subset — the queries whose
conventions the r14 sweep touched — so the two divergences the tool
caught on its first run (the GREATEST(...) oracle CTEs emitting a ''
shingle for no-token docs; DuckDB array_to_string([]) being NULL where
Spark array_join([]) is ''; plus mm3's NULL-payload row) stay fixed.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import adversarial_sim  # noqa: E402

SUBSET = [
    # event-time family: the NULL-ts watermark contract and the NULL-body
    # ingest path (waves 2-3) — one streaming window + the ingest twin
    "st1_stream_window_agg",
    "i1_ingest_dead_letter",
    "w6_lag_lead",
    "j4_semi_anti_join",
    "n1_topk_cosine",
    "bm25_1_query_ranking",
    "ch1_doc_chunks",
    "d1_exact_dedup",
    "d2_ngram_jaccard",
    "d2b_ngram_jaccard_capped",
    "d6_editdist_recheck",
    "dec1_decontamination",
    "lm1_unigram_freq_score",
    "ll1_training_corpus",
    "mix1_domain_mixing",
    "mm1_media_metadata",
    "mm2b_media_decode_oracle",
    "mm3_frame_sample",
    "mm4b_resize_oracle",
    "pack1_token_budget",
    "par1_paragraph_dedup",
    "pii1_redaction",
    "samp1_stratified_sample",
    "sd1_substring_dup_report",
    "sp1_hash_split",
    "ta1_text_stats",
    "ta2_lang_id",
    "ta3_quality_score",
    "ta4_doc_fingerprint",
    "ta5_repetition",
    "tc1_line_cleaning",
    "tf1_keyword_topk",
    "udtf1_lateral_tokenize",
]


def test_documents_family_matches_oracles_on_hostile_fixture(spark):
    fails = adversarial_sim.run(names=SUBSET)
    assert not fails, f"hostile-fixture mismatches: {fails}"
