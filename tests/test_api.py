"""HTTP serving layer: route contract + JSON parity with the DataFrame
query functions (reference src/api/endpoints/weather.py:18-152,
health.py:9-16, main.py:8-32)."""

from __future__ import annotations

import datetime as dt
import http.client
import json
import threading
from wsgiref.simple_server import WSGIRequestHandler, make_server

import pytest

from weather_data_pipeline_sv_spark.api import create_app
from weather_data_pipeline_sv_spark.plans import queries as q

ASOF = dt.datetime(2025, 10, 10, 12, 0, 0)

_GOLD_SCHEMA = (
    "postal_code string, timestamp timestamp_ntz, data_type string, "
    "forecast_timestamp timestamp_ntz, temperature_avg double, "
    "temperature_min double, temperature_max double, precipitation_sum double, "
    "wind_speed_avg double, wind_direction_avg double, cloud_cover_avg double, "
    "pressure_msl_avg double, relative_humidity_avg double, "
    "num_stations int, avg_quality_score double"
)


def _row(pc, ts, data_type, fts=None, temp=10.0):
    return (
        pc, ts, data_type, fts, temp, temp - 2, temp + 2, 0.4, 3.2, 180.0,
        50.0, 1013.0, 70.0, 3, 0.9,
    )


@pytest.fixture(scope="module")
def gold(spark):
    rows = []
    for h in range(30):  # observations: 30 hourly rows back from ASOF
        rows.append(
            _row("10115", ASOF - dt.timedelta(hours=h), "observation", temp=10.0 + h)
        )
    for h in range(1, 60):  # forecasts: hourly rows after ASOF
        rows.append(
            _row(
                "10115", ASOF + dt.timedelta(hours=h), "forecast",
                fts=ASOF, temp=20.0 + h,
            )
        )
    rows.append(_row("99999", ASOF, "observation", temp=5.0))
    return spark.createDataFrame(rows, _GOLD_SCHEMA).cache()


@pytest.fixture(scope="module")
def client(spark, gold):
    """Real HTTP round-trip: the WSGI app under wsgiref on an OS-chosen
    port, driven through http.client."""
    app = create_app(spark, gold, asof_provider=lambda: ASOF)

    class Quiet(WSGIRequestHandler):
        def log_message(self, *a):
            pass

    httpd = make_server("127.0.0.1", 0, app, handler_class=Quiet)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    def get(path):
        conn = http.client.HTTPConnection("127.0.0.1", httpd.server_port)
        conn.request("GET", path)
        r = conn.getresponse()
        body = json.loads(r.read())
        conn.close()
        return r.status, body

    yield get
    httpd.shutdown()


def test_root_and_health(client):
    status, body = client("/")
    assert status == 200 and body["message"] == "Weather Data Pipeline API"
    status, body = client("/health/")
    assert status == 200 and body["status"] == "healthy"
    assert body["service"] == "weather-pipeline-api"


def test_postal_parity_with_dataframe(client, gold):
    status, body = client("/weather/postal/10115?hours=24")
    assert status == 200
    assert body["postal_code"] == "10115" and body["data_type"] == "observation"
    assert body["records"] == len(body["data"])
    # JSON parity with the DataFrame function the endpoint delegates to
    df_rows = q.weather_history(gold, "10115", "observation", ASOF, 24).collect()
    assert body["records"] == len(df_rows)
    api_first, df_first = body["data"][0], df_rows[0].asDict()
    assert api_first["temperature_avg"] == df_first["temperature_avg"]
    assert api_first["timestamp"] == df_first["timestamp"].isoformat()
    # hours bounds BOTH the range filter and the LIMIT (weather.py:43-51)
    assert body["records"] <= 24
    # real-column divergence from reference bug Q9: humidity served as
    # relative_humidity_avg
    assert "relative_humidity_avg" in api_first and "humidity_avg" not in api_first


def test_postal_hours_param(client):
    status, body = client("/weather/postal/10115?hours=5")
    assert status == 200 and body["records"] == 5


def test_latest_is_single_row_max_ts(client, gold):
    status, body = client("/weather/latest/10115")
    assert status == 200
    df_row = q.latest_weather(gold, "10115").collect()[0].asDict()
    assert body["timestamp"] == df_row["timestamp"].isoformat()
    assert body["temperature_avg"] == df_row["temperature_avg"]


def test_forecast_window_ascending(client, gold):
    status, body = client("/weather/forecast/10115?hours_ahead=10")
    assert status == 200 and body["forecast_hours"] == 10
    ts = [r["timestamp"] for r in body["data"]]
    assert ts == sorted(ts)
    assert body["records"] == len(
        q.forecast_window(gold, "10115", ASOF, 10).collect()
    )


def test_404_contract(client):
    status, body = client("/weather/postal/00000")
    assert status == 404 and "00000" in body["detail"]
    status, body = client("/weather/latest/00000")
    assert status == 404
    status, body = client("/weather/forecast/99999")
    assert status == 404 and "No forecast data" in body["detail"]
    status, _ = client("/nope")
    assert status == 404


def test_422_on_non_integer_params(client):
    # FastAPI validation contract (reference: Query(...) coercion): junk
    # ints are a 422 with a detail LIST, not a 500 (round-2 ADVICE)
    for url in (
        "/weather/postal/10115?hours=abc",
        "/weather/forecast/10115?hours_ahead=2.5",
    ):
        status, body = client(url)
        assert status == 422, url
        [d] = body["detail"]
        assert d["type"] == "int_parsing" and d["loc"][0] == "query"
    # valid params still fine after the guard
    status, _ = client("/weather/postal/10115?hours=5")
    assert status == 200
