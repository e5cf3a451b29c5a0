"""Deterministic synthetic weather bronze tables per FIXTURES.md.

Seeded numpy generation anchored to a fixed ``ASOF``; every edge case the
reference quirks Q1-Q11 need is planted explicitly:

- stations: 2 with NULL coords, 1 outside every 50 km radius, 1 exactly at
  a postal centroid (zero distance → NULL IDW weight, Q11)
- postal codes: 2 with NULL centroid, 1 with no station within 50 km
- observations: NULL mixes around the completeness boundary, outliers in
  every score branch (Q2/Q3), validated/synop mix, >20 °C jump pairs within
  1 h and across a gap, duplicate-key re-deliveries
- forecasts: 3 issue runs with overlapping targets, duplicate
  (station, issue, target) re-deliveries, forecast-variant outliers
"""

from __future__ import annotations

import datetime as dt
import itertools

import numpy as np

ASOF = dt.datetime(2025, 10, 10, 12, 0, 0)

N_STATIONS = 20
N_POSTAL = 30


def _h(hours: float) -> dt.datetime:
    return ASOF + dt.timedelta(hours=hours)


def make_stations(rng: np.random.Generator) -> list[tuple]:
    rows = []
    for i in range(1, N_STATIONS + 1):
        sid = f"S{i:03d}"
        lat = float(rng.uniform(52.3, 52.7))
        lon = float(rng.uniform(13.0, 13.8))
        if i in (19, 20):  # NULL location → excluded by guard (P10)
            lat = lon = None
        elif i == 18:  # far outside every 50 km radius
            lat, lon = 48.1, 11.5
        elif i == 17:  # exactly at postal centroid #1 → zero distance (Q11)
            lat, lon = 52.500000, 13.400000
        rows.append(
            (sid, f"Station {sid}", lat, lon, float(rng.integers(30, 120)),
             "brightsky", _h(-24 * 30), ASOF)
        )
    return rows


def make_postal_codes(rng: np.random.Generator) -> list[tuple]:
    rows = []
    for i in range(N_POSTAL):
        code = f"{10115 + i * 7:05d}"
        lat = float(rng.uniform(52.3, 52.7))
        lon = float(rng.uniform(13.0, 13.8))
        if i == 0:  # matches station S017 exactly (zero-distance path)
            lat, lon = 52.500000, 13.400000
        elif i in (27, 28):  # NULL centroid → excluded by guard (P10)
            lat = lon = None
        elif i == 29:  # no station within 50 km → absent from gold
            lat, lon = 47.0, 8.0
        city, state = ("Berlin", "Berlin") if i % 3 else ("Potsdam", "Brandenburg")
        rows.append((code, city, state, lat, lon))
    return rows


def _measures(rng: np.random.Generator) -> dict:
    temp = float(np.round(rng.normal(12, 6), 2))
    return {
        "temperature": temp,
        "humidity": int(rng.integers(30, 101)),
        "pressure": float(np.round(rng.normal(1013, 8), 2)),
        "wind_speed": float(np.round(abs(rng.normal(15, 10)), 2)),
        "wind_direction": int(rng.integers(0, 360)),
        "precipitation": 0.0 if rng.random() < 0.7 else float(np.round(rng.exponential(2), 2)),
        "cloud_cover": int(rng.integers(0, 101)),
        "visibility": float(np.round(rng.uniform(1000, 50000), 1)),
        "sunshine": float(np.round(rng.uniform(0, 60), 1)),
        "dew_point": float(np.round(temp - rng.uniform(2, 8), 2)),
    }


_MKEYS = (
    "temperature", "humidity", "pressure", "wind_speed", "wind_direction",
    "precipitation", "cloud_cover", "visibility", "sunshine", "dew_point",
)


def make_observations(rng: np.random.Generator, stations: list[tuple]) -> list[tuple]:
    rows = []
    coords = {s[0]: (s[2], s[3]) for s in stations}
    active = [s[0] for s in stations if s[0] not in ("S019", "S020")]
    for sid, hh in itertools.product(active, range(-120, 1)):
        m = _measures(rng)
        u = rng.random()
        # planted NULL mixes around the completeness boundary (P2)
        if u < 0.05:
            m["temperature"] = None  # exactly 1 critical NULL → kept, 0.6
        elif u < 0.08:
            m["temperature"] = None
            m["wind_speed"] = None  # 2 critical NULLs → dropped
        elif u < 0.10:
            m["temperature"] = None
            m["wind_speed"] = None
            m["precipitation"] = None  # 3 NULLs → dropped
        # outliers per score branch (Q2/Q3)
        elif u < 0.12:
            m["temperature"] = 72.5  # temp outlier → 0.3
        elif u < 0.13:
            m["wind_speed"] = 250.0  # wind outlier → 0.3
        elif u < 0.14:
            m["precipitation"] = 300.0  # precip-only outlier → 0.5 (obs)
        elif u < 0.15:
            m["humidity"] = 130  # humidity outlier → flag only (obs, Q3)
        elif u < 0.16:
            m["cloud_cover"] = 150  # cloud outlier → flag only (obs, Q3)
        validated = rng.random() >= 0.10
        stype = "historical" if validated else ("synop" if rng.random() < 0.5 else "current")
        lat, lon = coords[sid]
        rows.append(
            (sid, _h(hh), *[m[k] for k in _MKEYS], lat, lon, "brightsky",
             bool(validated), stype, _h(-1))
        )
    # temperature jump pair within 1 h (must count) — S001
    base = _measures(rng)
    rows.append(("S001", _h(0.25), 10.0, *[base[k] for k in _MKEYS[1:]],
                 *coords["S001"], "brightsky", True, "historical", _h(-1)))
    rows.append(("S001", _h(0.5), 35.0, *[base[k] for k in _MKEYS[1:]],
                 *coords["S001"], "brightsky", True, "historical", _h(-1)))
    # >20 °C jump across a 3 h gap (must NOT count) — S002 (its -120..0
    # hourly rows exist, so plant at minute offsets around a simulated gap)
    rows.append(("S002", _h(0.2), -5.0, *[base[k] for k in _MKEYS[1:]],
                 *coords["S002"], "brightsky", True, "historical", _h(-1)))
    rows.append(("S002", _h(3.4), 30.0, *[base[k] for k in _MKEYS[1:]],
                 *coords["S002"], "brightsky", True, "historical", _h(-1)))
    # duplicate-key re-delivery with changed values (update-wins, S5)
    for sid, hh in [("S003", -10), ("S004", -20)]:
        m = _measures(rng)
        rows.append((sid, _h(hh), *[m[k] for k in _MKEYS],
                     *coords[sid], "brightsky", True, "historical", _h(0)))
    return rows


def make_forecasts(rng: np.random.Generator, stations: list[tuple]) -> list[tuple]:
    rows = []
    coords = {s[0]: (s[2], s[3]) for s in stations}
    active = [s[0] for s in stations if s[0] not in ("S019", "S020")][:12]
    issues = [_h(-12), _h(-6), _h(0)]
    for sid, issue in itertools.product(active, issues):
        for step in range(1, 49):  # hourly targets, 48 h horizon
            m = _measures(rng)
            u = rng.random()
            if u < 0.04:
                m["temperature"] = None  # → 0.6 (fcst score)
            elif u < 0.06:
                m["temperature"] = None
                m["wind_speed"] = None  # dropped by completeness
            elif u < 0.08:
                m["temperature"] = 80.0  # → 0.3
            elif u < 0.09:
                m["precipitation"] = 400.0  # precip outlier: flag, score 0.5→
                # NOTE: fcst 1.0-branch has no precip range (Q2) — stays 1.0
            rows.append(
                (sid, issue, issue + dt.timedelta(hours=step),
                 *[m[k] for k in _MKEYS], *coords[sid], "brightsky", _h(-1))
            )
    # duplicate (station, issue, target) re-delivery → first-wins (S6)
    m = _measures(rng)
    rows.append(("S001", issues[0], issues[0] + dt.timedelta(hours=1),
                 *[m[k] for k in _MKEYS], *coords["S001"], "brightsky", _h(0)))
    return rows


def build_all() -> dict[str, list[tuple]]:
    rng = np.random.default_rng(42)
    stations = make_stations(rng)
    return {
        "weather_stations": stations,
        "postal_codes": make_postal_codes(rng),
        "raw_weather_observations": make_observations(rng, stations),
        "raw_weather_forecasts": make_forecasts(rng, stations),
    }
