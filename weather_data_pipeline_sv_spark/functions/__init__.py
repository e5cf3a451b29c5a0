import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import rnd, rnd_sql


def ntz_lit(t: dt.datetime) -> Column:
    """Timezone-naive timestamp literal.

    ``F.lit(datetime)`` builds a TimestampType literal through the host OS
    timezone (``mktime``) — wrong on a non-UTC host. Routing through a
    string parse to TIMESTAMP_NTZ is wall-clock exact everywhere.
    """
    return F.lit(t.strftime("%Y-%m-%d %H:%M:%S.%f")).cast("timestamp_ntz")


__all__ = ["rnd", "rnd_sql", "ntz_lit"]
