"""Scheduler-semantics parity with the reference's Airflow DAG configs
(dags/*_dag.py: cron schedule, retries=2 + 5-min delay, max_active_runs=1,
catchup=False)."""

from __future__ import annotations

import datetime as dt

import pytest

from weather_data_pipeline_sv_spark.plans.scheduler import (
    CronSchedule,
    Job,
    Scheduler,
    reference_jobs,
)

T0 = dt.datetime(2025, 10, 10, 0, 0)


def test_cron_six_hourly():
    s = CronSchedule("0 */6 * * *")
    fires = s.fires_between(T0, T0 + dt.timedelta(days=1))
    assert [f.hour for f in fires] == [6, 12, 18, 0]
    assert all(f.minute == 0 for f in fires)


def test_cron_hourly_at_30():
    s = CronSchedule("30 * * * *")
    fires = s.fires_between(T0, T0 + dt.timedelta(hours=3))
    assert [(f.hour, f.minute) for f in fires] == [(0, 30), (1, 30), (2, 30)]


def test_cron_rejects_bad_field():
    with pytest.raises(ValueError):
        CronSchedule("99 * * * *").matches(T0)
    with pytest.raises(ValueError):
        CronSchedule("* * * *").matches(T0)


def test_catchup_false_collapses_missed_intervals():
    runs = []
    sched = Scheduler(
        [Job("transform", CronSchedule("30 * * * *"), runs.append)],
        start=T0,
        sleep=lambda s: None,
    )
    # 5 hours elapse in one tick -> only the latest :30 fires
    recs = sched.tick(T0 + dt.timedelta(hours=5))
    assert len(recs) == 1 and recs[0].state == "success"
    assert runs == [dt.datetime(2025, 10, 10, 4, 30)]


def test_catchup_true_runs_all_intervals():
    runs = []
    sched = Scheduler(
        [Job("t", CronSchedule("30 * * * *"), runs.append, catchup=True)],
        start=T0,
        sleep=lambda s: None,
    )
    sched.tick(T0 + dt.timedelta(hours=3))
    assert [r.minute for r in runs] == [30, 30, 30]


def test_retries_two_with_five_minute_delay():
    calls, sleeps = [], []

    def flaky(asof):
        calls.append(asof)
        if len(calls) < 3:
            raise RuntimeError("transient")

    sched = Scheduler(
        [Job("t", CronSchedule("30 * * * *"), flaky)], start=T0,
        sleep=sleeps.append,
    )
    [rec] = sched.tick(T0 + dt.timedelta(hours=1))
    assert rec.state == "success" and rec.attempts == 3
    assert sleeps == [300.0, 300.0]  # retry_delay=timedelta(minutes=5)


def test_failure_after_retries_exhausted():
    def always_fails(asof):
        raise RuntimeError("boom")

    sched = Scheduler(
        [Job("t", CronSchedule("30 * * * *"), always_fails)], start=T0,
        sleep=lambda s: None,
    )
    [rec] = sched.tick(T0 + dt.timedelta(hours=1))
    assert rec.state == "failed" and rec.attempts == 3
    assert "boom" in rec.error


def test_max_active_runs_skips_overlap():
    sched = Scheduler([], start=T0, sleep=lambda s: None)

    def reentrant(asof):
        # an external trigger racing the active run must be skipped
        rec = sched.fire("t", asof + dt.timedelta(minutes=1))
        assert rec.state == "skipped_active"

    sched.jobs["t"] = Job("t", CronSchedule("30 * * * *"), reentrant)
    sched._last_tick["t"] = T0
    [rec] = sched.tick(T0 + dt.timedelta(hours=1))
    assert rec.state == "success"
    states = [r.state for r in sched.ledger]
    assert states == ["skipped_active", "success"]


def test_reference_jobs_cron_parity():
    jobs = {j.name: j for j in reference_jobs(lambda a: a, lambda a: a, lambda a: a)}
    assert jobs["ingest_observations_dag"].schedule.expr == "0 */6 * * *"
    assert jobs["ingest_forecasts_dag"].schedule.expr == "0 */6 * * *"
    assert jobs["transform_weather_dag"].schedule.expr == "30 * * * *"
    for j in jobs.values():  # default_args parity
        assert j.retries == 2
        assert j.retry_delay == dt.timedelta(minutes=5)
        assert j.max_active_runs == 1 and j.catchup is False


def test_cron_dom_dow_or_rule():
    # Vixie rule: both day fields restricted -> OR. "0 0 13 * 5" fires on
    # the 13th of the month AND on every Friday, not only Friday-the-13th.
    s = CronSchedule("0 0 13 * 5")
    assert s.matches(dt.datetime(2025, 6, 13))   # Fri 13 June (both match)
    assert s.matches(dt.datetime(2025, 10, 13))  # Mon 13 Oct (dom only)
    assert s.matches(dt.datetime(2025, 10, 17))  # Fri 17 Oct (dow only)
    assert not s.matches(dt.datetime(2025, 10, 14))  # Tue 14 Oct (neither)


def test_cron_dom_dow_and_when_one_unrestricted():
    # only dow restricted -> plain AND semantics (dom '*' matches all days)
    s = CronSchedule("0 0 * * 5")
    assert s.matches(dt.datetime(2025, 10, 17))      # Friday
    assert not s.matches(dt.datetime(2025, 10, 13))  # Monday
    # only dom restricted
    s2 = CronSchedule("0 0 13 * *")
    assert s2.matches(dt.datetime(2025, 10, 13))
    assert not s2.matches(dt.datetime(2025, 10, 17))


def test_cron_step_day_field_counts_as_unrestricted():
    # Vixie sets DOM_STAR for any field STARTING with '*', so '*/2' in dom
    # keeps the AND rule even though dow is restricted (round-3 review):
    # "0 0 */2 * 1" fires only on Mondays whose day-of-month is odd
    # (range(1,32,2) = 1,3,5,...), never on other odd days.
    s = CronSchedule("0 0 */2 * 1")
    assert s.matches(dt.datetime(2025, 10, 13))      # Mon the 13th
    assert not s.matches(dt.datetime(2025, 10, 15))  # Wed the 15th (dom-only)
    assert not s.matches(dt.datetime(2025, 10, 20))  # Mon the 20th (dow-only)


def test_max_active_runs_two_allows_one_overlap():
    sched = Scheduler([], start=T0, sleep=lambda s: None)
    depth = {"n": 0}

    def reentrant(asof):
        depth["n"] += 1
        if depth["n"] == 1:
            # first level: a second concurrent run is allowed...
            inner = sched.fire("t", asof + dt.timedelta(minutes=1))
            assert inner.state == "success"
            # ...but a third (fired while two are active) is skipped
            assert sched.ledger[-2].state == "skipped_active"
        elif depth["n"] == 2:
            third = sched.fire("t", asof + dt.timedelta(minutes=2))
            assert third.state == "skipped_active"

    sched.jobs["t"] = Job(
        "t", CronSchedule("30 * * * *"), reentrant, max_active_runs=2
    )
    sched._last_tick["t"] = T0
    [rec] = sched.tick(T0 + dt.timedelta(hours=1))
    assert rec.state == "success"
    assert sched._active == {}  # counts fully released
