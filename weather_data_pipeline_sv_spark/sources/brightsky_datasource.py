"""BrightSky-shaped weather feed as a Spark 4 Python Data Source.

The reference ingests weather via a driver-side HTTP client loop
(`brightsky_client.py:31-69`: one GET per (location, date range), tenacity
retry, then row-by-row inserts). The Spark-native re-expression makes the
feed a *first-class source*: `spark.read.format("brightsky_fixture")`
plans one input partition per (station, day) — on a 1000-executor cluster
that is thousands of concurrent fetch/parse tasks with per-partition retry
and locality, instead of a single driver loop — and pushes `station_id`
equality filters into partition planning so pruned partitions are never
fetched at all.

Network access is not available (and would break determinism), so the
reader generates the deterministic fixture payload in-process: values are
md5-derived functions of (station, hour), exactly the shape
`brightsky_client.normalize` expects. A real deployment would replace
``_records_for`` with the HTTP GET of `brightsky_client.py:36-69` —
partition planning, pushdown, schema, and retry placement all stay
identical, which is the point.

Retry: every partition fetch runs through ``sources.retry.retry_call``
with the reference's tenacity schedule (3 attempts, exponential 2→10 s —
`brightsky_client.py:31-35`), placed *inside* ``read()`` so it executes on
the executor: each (station, day) task retries independently, and a
transient failure re-fetches one partition rather than failing the batch.
Options ``retry_attempts`` / ``retry_min_wait`` / ``retry_max_wait``
override the schedule (``retry_min_wait=0`` keeps tests instant).
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)

from .retry import DEFAULT_ATTEMPTS, DEFAULT_MAX_WAIT, DEFAULT_MIN_WAIT, retry_call

_SCHEMA = (
    "station_id string, timestamp timestamp_ntz, temperature double, "
    "humidity int, pressure double, wind_speed double, wind_direction int, "
    "precipitation double, observation_type string"
)


class _StationDay(InputPartition):
    def __init__(self, station_id: str, day: dt.date):
        self.station_id = station_id
        self.day = day


def _u(station: str, hour: dt.datetime, field: str) -> float:
    """Deterministic uniform [0,1) from (station, hour, field)."""
    h = hashlib.md5(f"{station}|{hour.isoformat()}|{field}".encode()).hexdigest()
    return int(h[:13], 16) / float(1 << 52)


def _records_for(p: _StationDay) -> Iterator[tuple]:
    base = dt.datetime.combine(p.day, dt.time())
    for h in range(24):
        ts = base + dt.timedelta(hours=h)
        yield (
            p.station_id,
            ts,
            round(-5.0 + 35.0 * _u(p.station_id, ts, "temperature"), 2),
            int(30 + 70 * _u(p.station_id, ts, "humidity")),
            round(980.0 + 60.0 * _u(p.station_id, ts, "pressure"), 1),
            round(25.0 * _u(p.station_id, ts, "wind_speed"), 2),
            int(360 * _u(p.station_id, ts, "wind_direction")),
            round(max(0.0, 8.0 * _u(p.station_id, ts, "precipitation") - 4.0), 2),
            "historical" if _u(p.station_id, ts, "obs_type") < 0.8 else "synop",
        )


class BrightskyFixtureReader(DataSourceReader):
    def __init__(self, options: dict):
        self.stations: Sequence[str] = [
            s for s in options.get("stations", "S1,S2,S3").split(",") if s
        ]
        self.start = dt.date.fromisoformat(options.get("start_date", "2025-10-01"))
        self.days = int(options.get("days", "7"))
        self.retry_attempts = int(options.get("retry_attempts", DEFAULT_ATTEMPTS))
        self.retry_min_wait = float(options.get("retry_min_wait", DEFAULT_MIN_WAIT))
        self.retry_max_wait = float(options.get("retry_max_wait", DEFAULT_MAX_WAIT))
        self._station_eq: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept station_id equality — those partitions are pruned at plan
        time and never read; everything else is evaluated by Spark above."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("station_id",):
                self._station_eq = {str(f.value)}
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        stations = [
            s
            for s in self.stations
            if self._station_eq is None or s in self._station_eq
        ]
        return [
            _StationDay(s, self.start + dt.timedelta(days=d))
            for s in stations
            for d in range(self.days)
        ]

    def _fetch(self, partition: _StationDay) -> list[tuple]:
        """One partition's fetch — the seam a real deployment replaces with
        the HTTP GET of `brightsky_client.py:36-69`. Materialized to a list
        so a mid-stream failure is retried whole, never half-consumed."""
        return list(_records_for(partition))

    def read(self, partition: _StationDay) -> Iterator[tuple]:
        # executor-side retry: this runs inside the task, so each
        # (station, day) partition retries independently
        return iter(
            retry_call(
                self._fetch,
                partition,
                attempts=self.retry_attempts,
                min_wait=self.retry_min_wait,
                max_wait=self.retry_max_wait,
            )
        )


class BrightskyFixtureDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "brightsky_fixture"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> BrightskyFixtureReader:
        return BrightskyFixtureReader(self.options)
