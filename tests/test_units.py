"""Targeted unit tests for reference quirks (SURVEY.md §2.10) and the
merge-by-key writer's three conflict policies."""

from __future__ import annotations

import datetime as dt

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
    clean_forecasts,
    clean_observations,
)
from weather_data_pipeline_sv_spark.plans.queries import (
    forecast_accuracy,
    latest_weather,
    nearest_stations,
    nearest_stations_all,
    v_latest_forecasts,
    weather_history,
)

ASOF = dt.datetime(2025, 10, 10, 12, 0, 0)
H = lambda h: ASOF + dt.timedelta(hours=h)  # noqa: E731


def _obs_row(sid="S001", ts=None, temperature=10.0, wind_speed=5.0,
             precipitation=0.0, humidity=50, cloud_cover=10, **kw):
    base = dict(
        station_id=sid, timestamp=ts or H(-1), temperature=temperature,
        humidity=humidity, pressure=1013.0, wind_speed=wind_speed,
        wind_direction=180, precipitation=precipitation, cloud_cover=cloud_cover,
        visibility=10000.0, sunshine=30.0, dew_point=5.0, latitude=52.5,
        longitude=13.4, source="test", validated=True, source_type="historical",
        _ingest_ts=H(0),
    )
    base.update(kw)
    return tuple(base[f.name] for f in schemas.RAW_WEATHER_OBSERVATIONS.fields)


def _mk_obs(spark, rows):
    return spark.createDataFrame(rows, schemas.RAW_WEATHER_OBSERVATIONS)


# --- quality score branch order (Q2) and outlier flags (Q3) ----------------

def test_obs_quality_score_branches(spark):
    rows = [
        _obs_row("A"),                                  # clean → 1.0
        _obs_row("B", temperature=None),                # 1 null → 0.6
        _obs_row("C", temperature=72.0),                # temp outlier → 0.3
        _obs_row("D", wind_speed=250.0),                # wind outlier → 0.3
        _obs_row("E", precipitation=300.0),             # precip-only → 0.5
        _obs_row("F", humidity=130),                    # humidity: flag, 1.0
        _obs_row("G", temperature=None, wind_speed=None),  # dropped
    ]
    got = {
        r["station_id"]: (r["data_quality_score"], r["has_outliers"], r["quality_notes"])
        for r in clean_observations(_mk_obs(spark, rows), ASOF).collect()
    }
    assert set(got) == {"A", "B", "C", "D", "E", "F"}  # G dropped (P2)
    assert got["A"] == (1.0, False, None)
    assert got["B"][0] == 0.6 and got["B"][2] == "Missing critical fields"
    assert got["C"][0] == 0.3 and got["C"][2] == "Temperature outlier: 72.0"
    assert got["D"][0] == 0.3 and got["D"][2] == "Wind speed outlier: 250.0"
    assert got["E"] == (0.5, True, "Precipitation outlier: 300.0")
    # obs variant flags humidity outliers but score stays 1.0 (Q3)
    assert got["F"] == (1.0, True, None)


def test_fcst_quality_score_ignores_precip_range(spark):
    rows = [
        ("S1", H(-1), H(1), 10.0, 50, 1013.0, 5.0, 180, 300.0, 10, 10000.0,
         30.0, 5.0, 52.5, 13.4, "test", H(0)),  # precip outlier
        ("S2", H(-1), H(1), 10.0, 130, 1013.0, 5.0, 180, 0.0, 10, 10000.0,
         30.0, 5.0, 52.5, 13.4, "test", H(0)),  # humidity 130: no flag (Q3)
    ]
    df = spark.createDataFrame(rows, schemas.RAW_WEATHER_FORECASTS)
    got = {
        r["station_id"]: (r["data_quality_score"], r["has_outliers"])
        for r in clean_forecasts(df, ASOF).collect()
    }
    assert got["S1"] == (1.0, True)   # Q2: fcst 1.0 branch has no precip range
    assert got["S2"] == (1.0, False)  # Q3: fcst outlier flag skips humidity


# --- circular mean wrap (Q6) and zero-distance weight (Q11) ----------------

def _tiny_geo(spark, obs_rows):
    stations = spark.createDataFrame(
        [("S1", "St 1", 52.5, 13.4, 40.0, "t", H(-100), ASOF),
         ("S2", "St 2", 52.52, 13.42, 40.0, "t", H(-100), ASOF)],
        schemas.WEATHER_STATIONS,
    )
    postal = spark.createDataFrame(
        [("10115", "Berlin", "Berlin", 52.51, 13.41),
         ("10999", "Berlin", "Berlin", 52.5, 13.4)],  # == S1 → zero distance
        schemas.POSTAL_CODES,
    )
    stg = clean_observations(_mk_obs(spark, obs_rows), ASOF)
    return aggregate_to_postal_codes(
        stg, stations, postal, "observation", ASOF, lookback_hours=24
    )


def test_circular_mean_wraps_to_zero(spark):
    rows = [
        _obs_row("S1", wind_direction=350),
        _obs_row("S2", wind_direction=10),
    ]
    gold = {r["postal_code"]: r for r in _tiny_geo(spark, rows).collect()}
    # stations are nearly symmetric around 10115 → mean ≈ 0° (not 180°)
    assert gold["10115"]["wind_direction_avg"] in (0, 360 - 1, 1, 360)


def test_zero_distance_station_null_weight(spark):
    # only S1 reports, and S1 sits exactly on 10999's centroid: its weight is
    # NULL (1/0² guard) → weighted means NULL, but min/max/count survive (Q11)
    rows = [_obs_row("S1", temperature=21.5)]
    gold = {r["postal_code"]: r for r in _tiny_geo(spark, rows).collect()}
    z = gold["10999"]
    assert z["temperature_avg"] is None
    assert z["temperature_min"] == 21.5 and z["temperature_max"] == 21.5
    assert z["num_stations"] == 1
    # the non-degenerate postal code still gets the IDW value
    assert gold["10115"]["temperature_avg"] == 21.5


# --- merge-by-key conflict policies (S5/S6/Q8) -----------------------------

@pytest.fixture()
def kv(spark):
    def mk(rows):
        return spark.createDataFrame(rows, "k int, a string, b string, ord int")
    return mk


def test_merge_update_wins(kv):
    out = merge_update_wins(
        kv([(1, "old", "x", 0), (2, "keep", "y", 0)]),
        kv([(1, "new", "z", 1), (1, "newer", "w", 2), (3, "ins", "v", 1)]),
        keys=["k"], order_col="ord",
    )
    got = {r["k"]: (r["a"], r["b"]) for r in out.collect()}
    assert got == {1: ("newer", "w"), 2: ("keep", "y"), 3: ("ins", "v")}


def test_merge_first_wins(kv):
    out = merge_first_wins(
        kv([(1, "old", "x", 0)]),
        kv([(1, "new", "z", 1), (2, "first", "a", 1), (2, "second", "b", 2)]),
        keys=["k"], order_col="ord",
    )
    got = {r["k"]: r["a"] for r in out.collect()}
    assert got == {1: "old", 2: "first"}


def test_merge_partial_update(kv):
    # only column `a` updates on conflict; `b` keeps the existing value (Q8)
    out = merge_partial_update(
        kv([(1, "old_a", "old_b", 0), (2, "keep_a", "keep_b", 0)]),
        kv([(1, "new_a", "new_b", 1), (3, "ins_a", "ins_b", 1)]),
        keys=["k"], update_cols=["a"], order_col="ord",
    )
    got = {r["k"]: (r["a"], r["b"]) for r in out.collect()}
    assert got == {
        1: ("new_a", "old_b"),   # a updated, b retained
        2: ("keep_a", "keep_b"),
        3: ("ins_a", "ins_b"),   # new key inserts whole
    }


# --- serving queries -------------------------------------------------------

@pytest.fixture(scope="module")
def small_gold(spark):
    rows = []
    for hh in range(-5, 1):
        rows.append(("10115", H(hh), "observation", None, 10.0 + hh))
        rows.append(("10115", H(hh + 3), "forecast", H(-6), 11.0 + hh))
        rows.append(("10115", H(hh + 3), "forecast", H(-3), 12.0 + hh))
    df = spark.createDataFrame(
        rows,
        "postal_code string, timestamp timestamp_ntz, data_type string, "
        "forecast_timestamp timestamp_ntz, temperature_avg double",
    )
    for c in ["temperature_min", "temperature_max", "precipitation_sum",
              "wind_speed_avg", "wind_speed_max", "cloud_cover_avg",
              "pressure_msl_avg", "relative_humidity_avg", "avg_quality_score"]:
        df = df.withColumn(c, F.lit(1.0))
    return (
        df.withColumn("wind_direction_avg", F.lit(100))
        .withColumn("num_stations", F.lit(2).cast("long"))
    )


def test_weather_history_window_and_limit(small_gold):
    rows = weather_history(small_gold, "10115", "observation", ASOF, hours=3).collect()
    assert [r["timestamp"] for r in rows] == [H(0), H(-1), H(-2)]  # desc, limit=hours


def test_latest_weather(small_gold):
    r = latest_weather(small_gold, "10115").collect()
    assert len(r) == 1 and r[0]["timestamp"] == H(0)


def test_v_latest_forecasts_max_issue_only(small_gold):
    rows = v_latest_forecasts(small_gold).collect()
    assert rows and all(r["forecast_timestamp"] == H(-3) for r in rows)


def test_forecast_accuracy_math(small_gold):
    rows = forecast_accuracy(small_gold).collect()
    assert rows
    for r in rows:
        assert r["mae"] >= 0 and r["lead_time_hours"] > 0
    # forecast H(-3) issue for target H(0): obs 10.0, fcst 12.0-3+... check one
    tgt = [r for r in rows if r["forecast_target_time"] == H(0)
           and r["forecast_issue_time"] == H(-3)]
    assert tgt and abs(tgt[0]["temperature_error"] - abs(9.0 - 10.0)) < 1e-9


def test_nearest_stations_topk(spark):
    stations = spark.createDataFrame(
        [(f"S{i}", f"St {i}", 52.5 + i * 0.01, 13.4, 40.0, "t", H(-100), ASOF)
         for i in range(6)],
        schemas.WEATHER_STATIONS,
    )
    postal = spark.createDataFrame(
        [("10115", "Berlin", "Berlin", 52.5, 13.4)], schemas.POSTAL_CODES
    )
    rows = nearest_stations(stations, postal, "10115", k=3).collect()
    assert [r["station_id"] for r in rows] == ["S0", "S1", "S2"]
    assert rows[0]["distance_km"] == 0.0
    all_rows = nearest_stations_all(stations, postal, k=2).collect()
    assert len(all_rows) == 2 and {r["rank"] for r in all_rows} == {1, 2}


def test_scd2_history_collapses_and_versions(spark):
    from weather_data_pipeline_sv_spark.operators.merge import scd2_history

    rows = [
        # entity 1: A → A (no-op, collapses) → B → A ; same-ts tie at t4
        (1, 1, "A", 10),
        (1, 2, "A", 11),
        (1, 3, "B", 12),
        (1, 4, "A", 13),
        (1, 4, "A2", 14),  # higher ord wins the t=4 instant
        # entity 2: single state, stays current
        (2, 1, "X", 20),
    ]
    df = spark.createDataFrame(rows, "k int, t int, state string, ord int")
    out = scd2_history(df, keys=["k"], state_cols=["state"], ts_col="t",
                       order_col="ord")
    got = {
        (r["k"], r["version"]): (r["state"], r["valid_from"], r["valid_to"],
                                 r["is_current"])
        for r in out.collect()
    }
    assert got == {
        (1, 1): ("A", 1, 3, False),    # t=2 no-op collapsed into v1
        (1, 2): ("B", 3, 4, False),
        (1, 3): ("A2", 4, None, True), # ord=14 beat ord=13 at t=4
        (2, 1): ("X", 1, None, True),
    }


def test_quantize_int8_roundtrip_bounds(spark):
    from weather_data_pipeline_sv_spark.operators.similarity import (
        quantization_report, quantize_int8,
    )
    import pyspark.sql.functions as F

    rows = [
        (0, [1.0, -0.5, 0.25, 127.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),        # zero vector must stay finite
        (2, [-3.5, 2.0, 1e-9, 0.75]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    q = quantize_int8(df).collect()
    for r in q:
        assert all(abs(v) <= 127 for v in r["q"])       # int8 range
        for orig, deq in zip(rows[r["vec_id"]][1], r["deq"]):
            assert abs(orig - deq) <= r["q_scale"] / 2 + 1e-12  # ½-step bound
    rep = {r["vec_id"]: r for r in quantization_report(df).collect()}
    assert rep[0]["cosine_deq"] > 0.999   # 8-bit keeps direction
    assert rep[1]["mae"] == 0.0           # zero vector reconstructs exactly
