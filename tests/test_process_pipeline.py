"""Golden test for the process (bag-movement) pipeline (SURVEY.md §3.2):
P5 no-op filter, P6 missing-key dead-letter, A4 stage transfer, A5
completion counter, A6 N:1 status map, and the same-column stale-read
clobber (+1 net for sewer→sewer transitions)."""

import pyspark.sql.types as T
import pytest

from data_transform_make_spark.plans.process_pipeline import process_webhook_pipeline

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("previous_status", T.StringType()),
        T.StructField("inventory_id", T.StringType()),
    ]
)
INVENTORY = T.StructType(
    [
        T.StructField("inventory_id", T.StringType()),
        T.StructField("qty_office", T.IntegerType()),
        T.StructField("qty_warehouse", T.IntegerType()),
        T.StructField("qty_art", T.IntegerType()),
        T.StructField("qty_embroidery", T.IntegerType()),
        T.StructField("qty_sewer", T.IntegerType()),
        T.StructField("qty_completed", T.IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def result(spark):
    events = spark.createDataFrame(
        [
            (1, "Warehouse", "Office", "I1"),     # office-1, warehouse+1
            (2, "Art", "Warehouse", "I1"),        # warehouse-1, art+1
            (3, "Cutting", "Art", "I1"),          # art-1, embroidery+1 (N:1)
            (4, "With Sewer", "Sewer Assigned", "I2"),  # same col -> net +1 (clobber)
            (5, "Complete", "Embroidery", "I3"),  # embroidery-1, completed+1
            (6, "Office", "Office", "I4"),        # no-op: prev==curr (P5)
            (7, "Art", None, "I4"),               # no-op: prev null (P5)
            (8, "Art", "", "I4"),                 # no-op: prev '' JS-falsy (P5)
            (9, "Warehouse", "Office", None),     # dead letter (P6)
            (10, "Warehouse", "Office", ""),      # dead letter (P6, JS-falsy)
            (11, "Office", "Unknown Status", "I5"),  # prev unmapped: only +1 office
            (12, "Complete", "Complete2", "I5"),  # prev unmapped, curr Complete
        ],
        EVENTS,
    )
    inventory = spark.createDataFrame(
        [
            ("I1", 5, 5, 5, 5, 5, 0),
            ("I2", 0, 0, 0, 0, 9, 0),
            ("I3", 0, 0, 0, 4, 0, None),  # NULL completed -> parseInt(x||0)
            ("I4", 1, 1, 1, 1, 1, 1),
            ("I5", 2, 0, 0, 0, 0, 0),
        ],
        INVENTORY,
    )
    return process_webhook_pipeline(events, inventory)


def test_stage_transfers(result):
    post = {r.inventory_id: r for r in result.updated_inventory.collect()}
    i1 = post["I1"]
    assert (i1.qty_office, i1.qty_warehouse, i1.qty_art, i1.qty_embroidery) == (4, 5, 5, 6)


def test_same_column_clobber(result):
    # Sewer Assigned -> With Sewer: both qty_sewer; reference nets +1
    assert {r.inventory_id: r for r in result.updated_inventory.collect()}["I2"].qty_sewer == 10


def test_completion(result):
    i3 = {r.inventory_id: r for r in result.updated_inventory.collect()}["I3"]
    assert (i3.qty_embroidery, i3.qty_completed) == (3, 1)


def test_noops_leave_untouched(result):
    i4 = {r.inventory_id: r for r in result.updated_inventory.collect()}["I4"]
    assert (i4.qty_office, i4.qty_warehouse, i4.qty_art, i4.qty_embroidery, i4.qty_sewer, i4.qty_completed) == (1, 1, 1, 1, 1, 1)


def test_unmapped_statuses(result):
    i5 = {r.inventory_id: r for r in result.updated_inventory.collect()}["I5"]
    # ev11: +1 office only; ev12: +1 completed only
    assert (i5.qty_office, i5.qty_completed) == (3, 1)


def test_dead_letter(result):
    dead = result.dead_letter.collect()
    assert sorted(r.event_id for r in dead) == [9, 10]
    assert all(r.reject_reason == "missing_inventory_id" for r in dead)
