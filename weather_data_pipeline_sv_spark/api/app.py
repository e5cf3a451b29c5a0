"""HTTP API over the gold table — the reference's FastAPI surface, served
from Spark DataFrames.

Mirrors `src/api/` of the reference exactly at the route level:

- ``GET /``                                → service banner (`main.py:30-32`)
- ``GET /health/``                         → liveness (`endpoints/health.py:9-16`)
- ``GET /weather/postal/{pc}?data_type=&hours=`` → last-N-hours envelope
  (`endpoints/weather.py:18-67`)
- ``GET /weather/latest/{pc}``             → single latest row
  (`endpoints/weather.py:69-106`)
- ``GET /weather/forecast/{pc}?hours_ahead=`` → ascending forecast window
  envelope (`endpoints/weather.py:108-152`)

404 when a postal code yields no rows, 500 with the error detail otherwise
— the same status contract as the reference's HTTPException handling.
Column divergence from the reference is deliberate and documented: the
reference SQL selects ``humidity_avg``, a column that does not exist in its
own schema (bug Q9, SURVEY §6); we serve ``relative_humidity_avg``, the
real column, matching `plans/queries.py`.

FastAPI is not installed in this environment, so the app is a
dependency-free WSGI callable (PEP 3333) — runnable under any WSGI server
(`wsgiref` for dev via :func:`serve`, gunicorn/uvicorn in production). The
handlers delegate 1:1 to the DataFrame functions in ``plans/queries`` —
the HTTP layer owns only routing, param parsing, and JSON shaping, so the
tested DataFrame semantics ARE the endpoint semantics.

Serving-from-Spark note: each request triggers a Spark job over the gold
DataFrame. That is the right shape for an analytics API backed by a
warehouse; for low-latency point lookups at scale you would persist gold
partitioned by date and rely on partition pruning + the postal_code filter
pushdown (both already proven in tests/test_plan_quality.py), or export
gold to a serving store — the reference's Postgres plays that role.
"""

from __future__ import annotations

import datetime as dt
import json
import re
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

from ..plans import queries as q

_SERVICE = "weather-pipeline-api"
_VERSION = "1.0.0"


def _utcnow() -> dt.datetime:
    """Naive-UTC now — the reference's ``datetime.utcnow()`` / SQL NOW()."""
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


def _jsonable(v: Any) -> Any:
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return v


def _rows(df: DataFrame) -> list[dict[str, Any]]:
    return [
        {k: _jsonable(v) for k, v in r.asDict().items()} for r in df.collect()
    ]


class _HttpError(Exception):
    def __init__(self, status: int, detail: Any):
        self.status, self.detail = status, detail


def _int_param(params: dict[str, str], name: str, default: int) -> int:
    """Parse an integer query param, replying 422 on junk — FastAPI's
    validation-error contract (the reference returns a 422 with a
    ``detail`` list for ``?hours=abc``; the generic handler would have
    turned the ValueError into a 500 — round-2 ADVICE)."""
    raw = params.get(name)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        raise _HttpError(
            422,
            [
                {
                    "type": "int_parsing",
                    "loc": ["query", name],
                    "msg": "Input should be a valid integer, unable to "
                    "parse string as an integer",
                    "input": raw,
                }
            ],
        ) from None


def create_app(
    spark,
    gold: DataFrame,
    asof_provider: Callable[[], dt.datetime] = _utcnow,
):
    """Build the WSGI app closing over a SparkSession and the gold frame.

    ``asof_provider`` supplies the reference's NOW() — injectable so tests
    (and replay/debug runs) are deterministic."""

    routes: list[tuple[re.Pattern[str], Callable[..., tuple[int, Any]]]] = []

    def route(pattern: str):
        def deco(fn):
            routes.append((re.compile(f"^{pattern}$"), fn))
            return fn

        return deco

    @route(r"/")
    def root(params):
        return 200, {"message": "Weather Data Pipeline API", "version": _VERSION}

    @route(r"/health/?")
    def health(params):
        return 200, {
            "status": "healthy",
            "timestamp": _utcnow().isoformat(),
            "service": _SERVICE,
        }

    @route(r"/weather/postal/(?P<postal_code>[^/]+)")
    def postal(params, postal_code):
        data_type = params.get("data_type", "observation")
        hours = _int_param(params, "hours", 24)
        rows = _rows(
            q.weather_history(gold, postal_code, data_type, asof_provider(), hours)
        )
        if not rows:
            raise _HttpError(
                404, f"No weather data found for postal code {postal_code}"
            )
        return 200, {
            "postal_code": postal_code,
            "data_type": data_type,
            "records": len(rows),
            "data": rows,
        }

    @route(r"/weather/latest/(?P<postal_code>[^/]+)")
    def latest(params, postal_code):
        rows = _rows(q.latest_weather(gold, postal_code))
        if not rows:
            raise _HttpError(
                404, f"No weather data found for postal code {postal_code}"
            )
        return 200, rows[0]

    @route(r"/weather/forecast/(?P<postal_code>[^/]+)")
    def forecast(params, postal_code):
        hours_ahead = _int_param(params, "hours_ahead", 48)
        rows = _rows(
            q.forecast_window(gold, postal_code, asof_provider(), hours_ahead)
        )
        if not rows:
            raise _HttpError(
                404, f"No forecast data found for postal code {postal_code}"
            )
        return 200, {
            "postal_code": postal_code,
            "forecast_hours": hours_ahead,
            "records": len(rows),
            "data": rows,
        }

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "/")
        params = _parse_qs(environ.get("QUERY_STRING", ""))
        try:
            if environ.get("REQUEST_METHOD", "GET") != "GET":
                raise _HttpError(405, "Method Not Allowed")
            for pat, fn in routes:
                m = pat.match(path)
                if m:
                    status, body = fn(params, **m.groupdict())
                    break
            else:
                raise _HttpError(404, "Not Found")
        except _HttpError as e:
            status, body = e.status, {"detail": e.detail}
        except Exception as e:  # the reference's 500-with-detail contract
            status, body = 500, {"detail": str(e)}
        payload = json.dumps(body).encode()
        start_response(
            f"{status} {_REASON.get(status, 'OK')}",
            [
                ("Content-Type", "application/json"),
                ("Content-Length", str(len(payload))),
            ],
        )
        return [payload]

    return app


_REASON = {
    200: "OK",
    404: "Not Found",
    405: "Method Not Allowed",
    422: "Unprocessable Entity",
    500: "Internal Server Error",
}


def _parse_qs(qs: str) -> dict[str, str]:
    from urllib.parse import parse_qsl

    return dict(parse_qsl(qs))


def serve(app, host: str = "127.0.0.1", port: int = 8000):
    """Dev server (wsgiref). Production: any WSGI server, same callable."""
    from wsgiref.simple_server import make_server

    with make_server(host, port, app) as httpd:
        httpd.serve_forever()
