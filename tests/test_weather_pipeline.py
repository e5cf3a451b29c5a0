"""Weather-pipeline golden tests: Spark plans vs an independent DuckDB
oracle on the synthetic bronze fixtures (FIXTURES.md), plus targeted unit
tests for every reference quirk (SURVEY.md §2.10).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.merge import (
    merge_first_wins,
    merge_partial_update,
    merge_update_wins,
)
from weather_data_pipeline_sv_spark.plans import schemas
from weather_data_pipeline_sv_spark.plans.aggregation import aggregate_to_postal_codes
from weather_data_pipeline_sv_spark.plans.cleaning import (
    check_temporal_consistency,
    clean_forecasts,
    clean_observations,
)
from weather_data_pipeline_sv_spark.plans.pipeline import run_transform

from weather_fixtures import ASOF, build_all
from weather_oracle import gold_oracle_sql, temporal_issue_count_sql

SCHEMAS = {
    "weather_stations": schemas.WEATHER_STATIONS,
    "postal_codes": schemas.POSTAL_CODES,
    "raw_weather_observations": schemas.RAW_WEATHER_OBSERVATIONS,
    "raw_weather_forecasts": schemas.RAW_WEATHER_FORECASTS,
}

GOLD_COMPARE_COLS = [
    f.name
    for f in schemas.ANALYTICS_WEATHER_BY_POSTAL_CODE.fields
    if f.name not in ("interpolated_fields", "created_at", "updated_at")
]


@pytest.fixture(scope="session")
def weather_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("weather_bronze")
    for name, rows in build_all().items():
        spark.createDataFrame(rows, schema=SCHEMAS[name]).write.mode(
            "overwrite"
        ).parquet(str(base / name))
    return base


@pytest.fixture(scope="session")
def bronze(spark, weather_dir):
    out = {
        name: spark.read.schema(SCHEMAS[name]).parquet(str(weather_dir / name))
        for name in SCHEMAS
    }
    # ingestion-time key enforcement (reference ON CONFLICT at insert):
    # obs update-wins (S5), forecasts first-wins / DO NOTHING (S6)
    empty_obs = spark.createDataFrame([], schemas.RAW_WEATHER_OBSERVATIONS)
    empty_fcst = spark.createDataFrame([], schemas.RAW_WEATHER_FORECASTS)
    out["raw_weather_observations"] = merge_update_wins(
        empty_obs, out["raw_weather_observations"],
        ["station_id", "timestamp"], order_col="_ingest_ts",
    )
    out["raw_weather_forecasts"] = merge_first_wins(
        empty_fcst, out["raw_weather_forecasts"],
        ["station_id", "forecast_timestamp", "target_timestamp"],
        order_col="_ingest_ts",
    )
    return out


@pytest.fixture(scope="session")
def duck(weather_dir):
    con = duckdb.connect()
    for name in SCHEMAS:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{weather_dir / name}/*.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return 0.0 if v == 0.0 else v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _rows(rows):
    return sorted(repr(tuple(_norm(v) for v in r)) for r in rows)


@pytest.mark.parametrize(
    "data_type,lookback", [("observation", 168), ("forecast", 48)]
)
def test_gold_matches_oracle(spark, bronze, duck, data_type, lookback):
    if data_type == "observation":
        stg = clean_observations(bronze["raw_weather_observations"], ASOF, lookback)
    else:
        stg = clean_forecasts(bronze["raw_weather_forecasts"], ASOF, lookback)
    gold = aggregate_to_postal_codes(
        stg,
        bronze["weather_stations"],
        bronze["postal_codes"],
        data_type,
        ASOF,
        lookback_hours=lookback,
    ).select(*GOLD_COMPARE_COLS)

    res = duck.execute(gold_oracle_sql(data_type, ASOF, lookback))
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert gold.columns == duck_cols
    spark_rows = [tuple(r) for r in gold.collect()]
    assert len(spark_rows) == len(duck_rows) > 0
    s, d = _rows(spark_rows), _rows(duck_rows)
    diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
    assert s == d, f"{data_type} gold mismatch; first diffs: {diffs}"


def test_gold_edge_cases_present(spark, bronze):
    """The fixture edge cases actually exercise the intended paths."""
    stg = clean_observations(bronze["raw_weather_observations"], ASOF, 168)
    gold = aggregate_to_postal_codes(
        stg, bronze["weather_stations"], bronze["postal_codes"],
        "observation", ASOF, lookback_hours=168,
    )
    rows = gold.collect()
    codes = {r["postal_code"] for r in rows}
    assert "10115" in codes  # zero-distance postal code present
    # NULL-centroid and out-of-range postal codes absent
    assert not codes & {
        f"{10115 + 27 * 7:05d}", f"{10115 + 28 * 7:05d}", f"{10115 + 29 * 7:05d}"
    }
    # far-away station never contributes: every group within 50 km
    assert all(r["max_distance_km"] <= 50.0 for r in rows)
    # multi-station and single-station hours both occur
    n_st = {r["num_stations"] for r in rows}
    assert max(n_st) >= 2


def test_temporal_consistency_matches_oracle(spark, bronze, duck):
    stg = clean_observations(bronze["raw_weather_observations"], ASOF, 168)
    n_spark = check_temporal_consistency(stg, ASOF, 24).count()
    n_duck = duck.execute(temporal_issue_count_sql(ASOF, 24)).fetchone()[0]
    assert n_spark == n_duck > 0  # fixture plants at least one true jump


def test_run_transform_end_to_end(spark, bronze):
    res = run_transform(
        bronze["raw_weather_observations"],
        bronze["raw_weather_forecasts"],
        bronze["weather_stations"],
        bronze["postal_codes"],
        ASOF,
        validate=True,
    )
    gold = res.gold.cache()
    types = {r["data_type"] for r in gold.select("data_type").distinct().collect()}
    assert types == {"observation", "forecast"}
    # gold key uniqueness (reference UNIQUE constraint, schema.sql:235)
    dup = (
        gold.groupBy("postal_code", "timestamp", "data_type", "forecast_timestamp")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    # observation rows carry NULL forecast_timestamp; forecast rows don't
    assert (
        gold.filter(
            (F.col("data_type") == "observation")
            & F.col("forecast_timestamp").isNotNull()
        ).count()
        == 0
    )
    assert (
        gold.filter(
            (F.col("data_type") == "forecast") & F.col("forecast_timestamp").isNull()
        ).count()
        == 0
    )
    assert res.temporal_issues > 0
    assert set(res.validation) >= {"passed", "issues", "obs_postal_codes"}
    gold.unpersist()


def test_idempotent_rerun(spark, bronze):
    """Re-running the transform and merging into existing gold is a no-op
    (the ON CONFLICT idempotency property, aggregation.py:205-222)."""
    kwargs = dict(
        raw_observations=bronze["raw_weather_observations"],
        raw_forecasts=bronze["raw_weather_forecasts"],
        stations=bronze["weather_stations"],
        postal_codes=bronze["postal_codes"],
        asof=ASOF,
    )
    first = run_transform(**kwargs).gold
    second = run_transform(existing_gold=first, **kwargs).gold
    assert second.count() == first.count()
    a = _rows([tuple(r) for r in first.select(*GOLD_COMPARE_COLS).collect()])
    b = _rows([tuple(r) for r in second.select(*GOLD_COMPARE_COLS).collect()])
    assert a == b


@pytest.mark.parametrize("data_type,lookback",
                         [("observation", 168), ("forecast", 48)])
def test_grid_spatial_path_equals_broadcast(spark, bronze, data_type,
                                            lookback):
    """The X4 grid equi-join path (spatial_join='grid') produces the
    IDENTICAL gold table as the reference-shaped broadcast-NL path —
    same pairs AND same float distances (both compute the same
    haversine), so the strategy switch is purely physical. 'auto' picks
    broadcast at this dim size (900-row postal table)."""
    if data_type == "observation":
        stg = clean_observations(
            bronze["raw_weather_observations"], ASOF, lookback)
    else:
        stg = clean_forecasts(
            bronze["raw_weather_forecasts"], ASOF, lookback)

    def gold_with(strategy):
        return aggregate_to_postal_codes(
            stg, bronze["weather_stations"], bronze["postal_codes"],
            data_type, ASOF, lookback_hours=lookback,
            spatial_join=strategy,
        ).select(*GOLD_COMPARE_COLS)

    b = _rows([tuple(r) for r in gold_with("broadcast").collect()])
    g = _rows([tuple(r) for r in gold_with("grid").collect()])
    assert b == g and len(b) > 0
    a = _rows([tuple(r) for r in gold_with("auto").collect()])
    assert a == b
    # plan pins: broadcast path is a BroadcastNestedLoopJoin (never a
    # cartesian); the grid path replaces it with an equi join on the
    # cell key — no NL join anywhere in its plan
    bplan = gold_with("broadcast")._jdf.queryExecution().executedPlan().toString()
    gplan = gold_with("grid")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in bplan
    assert "CartesianProduct" not in bplan
    assert "BroadcastNestedLoopJoin" not in gplan
    assert "CartesianProduct" not in gplan

    with pytest.raises(ValueError, match="spatial_join"):
        gold_with("bogus").collect()


def test_auto_selector_point_side_crossover(spark, bronze, monkeypatch):
    """'auto' decides on BOTH sides of the BNL cost product (round-7
    verdict #2): |points| x |centroids| haversines. At fixture scale the
    product sits far below BROADCAST_MAX_PROBE_PAIRS -> broadcast; with
    the pair budget shrunk, the SAME data must select grid (this is the
    wx30 configuration in miniature: tiny dim, big fact) — and the
    centroid cap alone must also still force grid. Results are pinned
    identical across the selection, so the heuristic is purely
    physical."""
    from weather_data_pipeline_sv_spark.plans import aggregation as agg_mod

    stg = clean_observations(bronze["raw_weather_observations"], ASOF, 168)

    def gold_auto():
        return aggregate_to_postal_codes(
            stg, bronze["weather_stations"], bronze["postal_codes"],
            "observation", ASOF, lookback_hours=168, spatial_join="auto",
        ).select(*GOLD_COMPARE_COLS)

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    base = gold_auto()
    assert "BroadcastNestedLoopJoin" in plan_of(base)  # broadcast chosen
    want = _rows([tuple(r) for r in base.collect()])

    monkeypatch.setattr(agg_mod, "BROADCAST_MAX_PROBE_PAIRS", 0)
    by_pairs = gold_auto()
    assert "BroadcastNestedLoopJoin" not in plan_of(by_pairs)  # grid chosen
    assert _rows([tuple(r) for r in by_pairs.collect()]) == want

    monkeypatch.setattr(agg_mod, "BROADCAST_MAX_PROBE_PAIRS", 10**18)
    monkeypatch.setattr(agg_mod, "BROADCAST_MAX_CENTROIDS", 0)
    by_dim = gold_auto()
    assert "BroadcastNestedLoopJoin" not in plan_of(by_dim)  # grid chosen
    assert _rows([tuple(r) for r in by_dim.collect()]) == want


def test_grid_path_rejects_polar_centroids(spark, bronze):
    """bucketed_range_join clamps lon replication beyond |lat| 75 and
    would silently drop near-polar matches — the operator now RAISES at
    execution (plan-embedded, covers every caller including the grid
    pipeline path), instead of quietly diverging from the broadcast
    path it is pinned pair-identical to."""
    stg = clean_observations(bronze["raw_weather_observations"], ASOF, 168)
    polar = bronze["postal_codes"].withColumn(
        "centroid_lat",
        F.when(F.col("postal_code") == "10115", F.lit(80.0))
        .otherwise(F.col("centroid_lat")),
    )
    gold = aggregate_to_postal_codes(
        stg, bronze["weather_stations"], polar,
        "observation", ASOF, lookback_hours=168, spatial_join="grid",
    )
    with pytest.raises(Exception, match="polar centroid latitude"):
        gold.collect()
