"""The r14 fixture-blind-spot batteries, run as part of the suite.

tools/r14_blindspot.py asserts every measured convention (money folds,
stats folds, vector cosine, mulhash32 boundary ids, the tokenize
convention) against DuckDB on adversarial values the fixture never
carries. Importing and calling the sweep functions here makes the
dispositions in SCALE.md ("Round-14 blind-spot sweep") regression-proof:
an engine upgrade or a convention edit that silently moves any of them
fails the suite, not just the next manual sweep.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import r14_blindspot as sweep  # noqa: E402


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_money_fold_battery(con):
    sweep.sweep_money(con)


def test_stats_fold_battery(spark, con):
    sweep.sweep_stats_folds(spark, con)


def test_vector_battery(spark, con):
    sweep.sweep_vectors(spark, con)


def test_mulhash_boundary_battery(spark, con):
    sweep.sweep_mulhash(spark, con)


def test_tokenize_battery(spark, con):
    sweep.sweep_tokenize(spark, con)


def test_json_battery(spark, con):
    sweep.sweep_json(spark, con)


def test_datetime_battery(spark, con):
    sweep.sweep_datetime(spark, con)


def test_pii_regex_battery(spark, con):
    sweep.sweep_pii_regex(spark, con)
