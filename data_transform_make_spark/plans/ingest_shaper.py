"""Website-order ingest shaper — the Spark restatement of the reference's
``transformToSimpleRecords`` + ``combineEmbroideryInfo`` (makeRouter.js:40-75;
SURVEY.md §2.3 T1-T8, §2.9).

Input model (FIXTURES.md A1): parsed order payload with
    order: array<struct<productId, Name, Quantity, Subtotal, Total,
                        MetaData: array<struct<key, scalar, group:map>>>>
``MetaData`` is an ORDERED array of entries, not a map — JS ``for…in``
insertion order is load-bearing for the embroidery text blob
(SURVEY.md §7.4.4); an array column preserves it exactly.

Everything is native expressions (explode + HOF aggregate/filter) — zero
UDFs, so the shaper is whole-stage-codegen'd and map-only (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.js_compat import default_if_falsy

#: The six scalar MetaData keys the shaper projects (makeRouter.js:61-72).
SCALAR_KEYS = {
    "bag_color_website": "Color Selection",
    "rigid_lightened_website": "Rigid or Lightened Selection",
    "divider_website": "Divider Option Selection",
    "wheel_option_website": "Wheel Type",
    "logo_website": "Company Logo",
    "notes_website": "Additional Notes",
}


def _meta_scalar(meta: Column, key: str) -> Column:
    """``item.MetaData[key] || ""`` for scalar entries (makeRouter.js:63,67-72).

    First matching entry's scalar; JS object keys are unique so first==only.
    """
    hits = F.filter(meta, lambda e: e["key"] == F.lit(key))
    val = F.try_element_at(hits, F.lit(1))["scalar"]
    return default_if_falsy(val, "")


def combine_embroidery_info(meta: Column) -> Column:
    """``combineEmbroideryInfo`` (makeRouter.js:40-54) as a native HOF fold.

    Keep entries whose group has a truthy ``Position`` (non-empty string —
    JS ``group.Position``); per group emit ``key:\\n`` then
    ``  subKey: value\\n`` for every sub-entry whose value != 'No'
    (makeRouter.js:47); append a blank line after each group; trim the whole
    (JS ``.trim()`` strips all whitespace incl. newlines — Spark ``trim``
    strips only spaces, so a regex trim is used).
    Group sub-entry order: Spark map entry order is engine-undefined, so the
    canonical order is SORTED BY SUB-KEY (SURVEY.md §7.4.4 option A) —
    documented deviation from JS insertion order.
    """
    groups = F.filter(
        meta,
        lambda e: e["group"].isNotNull()
        & F.try_element_at(e["group"], F.lit("Position")).isNotNull()
        & (F.try_element_at(e["group"], F.lit("Position")) != F.lit("")),
    )
    def group_text(e: Column) -> Column:
        entries = F.filter(
            F.array_sort(F.map_entries(e["group"])), lambda kv: kv["value"] != F.lit("No")
        )
        body = F.aggregate(
            entries,
            F.lit(""),
            lambda acc, kv: F.concat(acc, F.lit("  "), kv["key"], F.lit(": "), kv["value"], F.lit("\n")),
        )
        return F.concat(e["key"], F.lit(":\n"), body, F.lit("\n"))

    combined = F.aggregate(groups, F.lit(""), lambda acc, e: F.concat(acc, group_text(e)))
    return F.regexp_replace(combined, r"^\s+|\s+$", "")


def transform_to_simple_records(orders_raw: DataFrame, order_col: str = "order") -> DataFrame:
    """1 payload → N flat 13-column records (makeRouter.js:56-75).

    posexplode keeps the array position as ``line_no`` so downstream
    first-wins dedup (P4) has its total order.
    """
    item = F.col("item")
    meta = item["MetaData"]
    color = _meta_scalar(meta, SCALAR_KEYS["bag_color_website"])
    return orders_raw.select(
        F.posexplode(F.col(order_col)).alias("line_no", "item")
    ).select(
        "line_no",
        item["productId"].alias("product_id"),
        F.concat(item["productId"], F.lit(" - "), color).alias("bag_lookup_website"),
        item["Name"].alias("bag_model_website"),
        color.alias("bag_color_website"),
        item["Quantity"].cast("string").alias("qty_website"),
        item["Subtotal"].alias("rate_website"),
        item["Total"].alias("total_website"),
        _meta_scalar(meta, SCALAR_KEYS["rigid_lightened_website"]).alias("rigid_lightened_website"),
        _meta_scalar(meta, SCALAR_KEYS["divider_website"]).alias("divider_website"),
        _meta_scalar(meta, SCALAR_KEYS["wheel_option_website"]).alias("wheel_option_website"),
        _meta_scalar(meta, SCALAR_KEYS["logo_website"]).alias("logo_website"),
        combine_embroidery_info(meta).alias("order_details_website"),
        _meta_scalar(meta, SCALAR_KEYS["notes_website"]).alias("notes_website"),
    )
