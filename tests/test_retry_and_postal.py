"""Tests for fetch retry/backoff (reference brightsky_client.py:31-35) and
Overpass postal-code ring repair (reference load_postal_codes_berlin.py:39-62)."""

from __future__ import annotations

import pytest

from weather_data_pipeline_sv_spark.sources import retry as rt
from weather_data_pipeline_sv_spark.sources.brightsky_datasource import (
    BrightskyFixtureReader,
)
from weather_data_pipeline_sv_spark.sources.postal_codes import (
    postal_centroids_from_overpass,
)


# ---------------------------------------------------------------------------
# retry/backoff
# ---------------------------------------------------------------------------

class _Flaky:
    def __init__(self, fail_times: int):
        self.calls = 0
        self.fail_times = fail_times

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError(f"transient #{self.calls}")
        return "payload"


def test_backoff_schedule_matches_tenacity_shape():
    # wait_exponential(multiplier=1, min=2, max=10) -> 2, 2, 4, 8, 10, 10
    assert rt.backoff_schedule(attempts=7) == [2.0, 2.0, 4.0, 8.0, 10.0, 10.0]


def test_retry_fails_twice_succeeds_third():
    flaky, sleeps = _Flaky(2), []
    out = rt.retry_call(flaky, sleep=sleeps.append)
    assert out == "payload" and flaky.calls == 3
    assert sleeps == [2.0, 2.0]


def test_retry_exhausted_reraises():
    flaky, sleeps = _Flaky(5), []
    with pytest.raises(ConnectionError, match="transient #3"):
        rt.retry_call(flaky, sleep=sleeps.append)
    assert flaky.calls == 3 and sleeps == [2.0, 2.0]


def test_with_retry_decorator():
    state = {"calls": 0}

    @rt.with_retry(sleep=lambda s: None)
    def fetch(url):
        state["calls"] += 1
        if state["calls"] < 3:
            raise TimeoutError("slow upstream")
        return {"url": url}

    assert fetch("http://example/weather") == {"url": "http://example/weather"}
    assert state["calls"] == 3


def test_datasource_partition_retry(monkeypatch):
    """Per-partition retry placement: a fetch that fails twice inside the
    task still yields the partition's 24 hourly rows on the third try."""
    reader = BrightskyFixtureReader(
        {"stations": "S1", "days": "1", "retry_min_wait": "0", "retry_max_wait": "0"}
    )
    [part] = reader.partitions()
    calls = {"n": 0}
    real_fetch = BrightskyFixtureReader._fetch

    def flaky_fetch(self, p):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise ConnectionError("transient fetch failure")
        return real_fetch(self, p)

    monkeypatch.setattr(BrightskyFixtureReader, "_fetch", flaky_fetch)
    rows = list(reader.read(part))
    assert len(rows) == 24 and calls["n"] == 3


def test_datasource_retry_exhaustion(monkeypatch):
    reader = BrightskyFixtureReader(
        {"stations": "S1", "days": "1", "retry_attempts": "2",
         "retry_min_wait": "0", "retry_max_wait": "0"}
    )
    [part] = reader.partitions()
    monkeypatch.setattr(
        BrightskyFixtureReader,
        "_fetch",
        lambda self, p: (_ for _ in ()).throw(ConnectionError("down")),
    )
    with pytest.raises(ConnectionError):
        list(reader.read(part))


# ---------------------------------------------------------------------------
# Overpass postal centroids + ring repair
# ---------------------------------------------------------------------------

def _way(pc, coords, name="Berlin", state="BE"):
    return {
        "type": "way",
        "tags": {"postal_code": pc, "name": name, "state": state},
        "geometry": [{"lon": x, "lat": y} for x, y in coords],
    }


def _rows(df):
    return {
        r["postal_code"]: (
            round(r["centroid_lon"], 9),
            round(r["centroid_lat"], 9),
            r["city"],
        )
        for r in df.collect()
    }


def test_open_ring_is_closed_and_centroid_correct(spark):
    # unit square, OPEN (last vertex != first) — the reference's repair case
    out = _rows(
        postal_centroids_from_overpass(
            spark, [_way("10115", [(0, 0), (1, 0), (1, 1), (0, 1)])]
        )
    )
    assert out["10115"][:2] == (0.5, 0.5)


def test_closed_ring_passes_through(spark):
    out = _rows(
        postal_centroids_from_overpass(
            spark, [_way("10117", [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)])]
        )
    )
    assert out["10117"][:2] == (1.0, 1.0)


def test_area_centroid_not_vertex_mean(spark):
    # dense vertex run along the bottom edge: vertex mean would sink toward
    # y=0; the area-weighted (ST_Centroid) answer stays (0.5, 0.5)
    dense_bottom = [(x / 10, 0.0) for x in range(11)] + [(1, 1), (0, 1)]
    out = _rows(postal_centroids_from_overpass(spark, [_way("10119", dense_bottom)]))
    lon, lat = out["10119"][:2]
    assert abs(lon - 0.5) < 1e-9 and abs(lat - 0.5) < 1e-9


def test_degenerate_ring_falls_back_to_vertex_mean(spark):
    out = _rows(
        postal_centroids_from_overpass(
            spark, [_way("10121", [(0, 0), (1, 1), (2, 2)])]
        )
    )
    assert out["10121"][:2] == (1.0, 1.0)


def test_first_wins_and_filters(spark):
    elements = [
        {"type": "relation", "tags": {"postal_code": "10999"}},  # skipped
        _way("10123", [(0, 0), (1, 0), (1, 1), (0, 1)], name="First"),
        _way("10123", [(10, 10), (11, 10), (11, 11), (10, 11)], name="Second"),
        _way("10125", [(0, 0), (1, 1)]),  # < 3 vertices: dropped
        {"type": "way", "tags": {}, "geometry": [
            {"lon": 0, "lat": 0}, {"lon": 1, "lat": 0}, {"lon": 1, "lat": 1},
        ]},  # no postal_code tag: dropped
    ]
    df = postal_centroids_from_overpass(spark, elements)
    out = _rows(df)
    assert set(out) == {"10123"}
    assert out["10123"] == (0.5, 0.5, "First")
