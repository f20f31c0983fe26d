"""Time-series gap filling: densify a sparse keyed series onto a fixed
step grid and fill the holes by LOCF (last observation carried forward)
and by linear interpolation — the telemetry-repair primitive a
monitoring / metrics pipeline runs before rate math, joins against
dense spines, or model-feature extraction (a missing hour must read as
"carried 4.0", not silently absent, or downstream window math shifts).

Complements ``q_daily_event_spine``'s zero-fill: counts gap-fill to 0,
but *level* metrics (gauge values, balances, sensor readings) gap-fill
to the carried or interpolated level.

Scale shape (100 TB): the spine is generated per key from that key's
own (min, max) bounds — ``sequence`` + ``explode`` off a per-key
aggregate, so spine rows are proportional to the OUTPUT, and no
driver-side range or cross join against a global calendar exists. The
left join onto observations and the two window frames (forward LOCF,
backward next-observation) all share one hash partitioning on the key:
Catalyst plans a single Exchange, then per-key sorts. Skew is bounded
by (time span / step) rows per key — a property of the grid, not of
the event volume.

All arithmetic is fixed-order double math over exact inputs
(interpolation fraction from integer epoch seconds), so a DuckDB
oracle replaying the same expressions matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_gaps(obs: DataFrame, key_col: str = "key", ts_col: str = "ts",
              value_col: str = "value", step: str = "1 hour") -> DataFrame:
    """Densify ``(key, ts, value)`` onto the ``step`` grid between each
    key's first and last observation, and fill missing values.

    ``obs`` must carry at most one row per (key, ts) with ``ts``
    already aligned to the grid (pre-bucket with ``date_trunc`` +
    groupBy — aggregation policy belongs to the caller); misaligned
    timestamps would miss the spine join silently, so align first.

    Returns one row per (key, grid ts): ``key_col``, ``ts_col``,
    ``value_col`` (the observation, NULL on filled rows),
    ``value_locf`` (last observation carried forward; NULL before the
    first observation), ``value_interp`` (linear interpolation between
    the surrounding observations; nearest observation at the edges)
    and ``filled`` (true on generated rows).
    """
    base = obs.select(F.col(key_col).alias("__gf_k"),
                      F.col(ts_col).alias("__gf_t"),
                      F.col(value_col).cast("double").alias("__gf_v"))
    bounds = base.groupBy("__gf_k").agg(F.min("__gf_t").alias("__gf_lo"),
                                        F.max("__gf_t").alias("__gf_hi"))
    spine = bounds.select(
        "__gf_k",
        F.explode(F.sequence("__gf_lo", "__gf_hi",
                             F.expr(f"INTERVAL {step}"))).alias("__gf_t"))
    j = spine.join(base, ["__gf_k", "__gf_t"], "left")
    wp = (Window.partitionBy("__gf_k").orderBy("__gf_t")
                .rowsBetween(Window.unboundedPreceding, 0))
    wn = (Window.partitionBy("__gf_k").orderBy("__gf_t")
                .rowsBetween(0, Window.unboundedFollowing))
    v = F.col("__gf_v")
    ts_obs = F.when(v.isNotNull(), F.col("__gf_t"))
    locf = F.last(v, ignorenulls=True).over(wp)
    prev_ts = F.last(ts_obs, ignorenulls=True).over(wp)
    nxt = F.first(v, ignorenulls=True).over(wn)
    next_ts = F.first(ts_obs, ignorenulls=True).over(wn)
    # integer epoch-second deltas -> one double divide: tz offsets
    # cancel in the differences and the fraction is the same closed
    # form in any engine (no float accumulation order to disagree on)
    frac = ((F.unix_timestamp(F.col("__gf_t")) - F.unix_timestamp(prev_ts))
            .cast("double")
            / (F.unix_timestamp(next_ts) - F.unix_timestamp(prev_ts))
            .cast("double"))
    interp = (F.when(v.isNotNull(), v)
               .when(locf.isNull(), nxt)          # before first obs
               .when(nxt.isNull(), locf)          # after last obs
               .otherwise(locf + (nxt - locf) * frac))
    return j.select(F.col("__gf_k").alias(key_col),
                    F.col("__gf_t").alias(ts_col),
                    v.alias(value_col),
                    locf.alias("value_locf"),
                    interp.alias("value_interp"),
                    v.isNull().alias("filled"))
