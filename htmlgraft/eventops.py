"""Relational/time operators over the ``events`` table (event_id, ts,
user_id, event_type, value, props): windowed rollups, sessionization, and
top-k — the metrics/reporting side of a crawl pipeline (SURVEY.md §2B lists
sort/limit/top-k and aggregation as required built-ins).

Same dual-dialect scheme as textops: outputs are strings/integers only
(doubles enter only via order-independent min/max, which are exact), so the
DuckDB oracle is a value-level check.

Scale notes: all three are single-shuffle hash aggregations / window scans
keyed on (hour, type), user_id — no joins, partial aggregation map-side.
"""

from __future__ import annotations

from .textops import _d


def events_hourly_sql(duck: bool, events: str = "events") -> str:
    """Hourly rollup by event type.  min/max are order-independent (exact
    doubles); sums of doubles are NOT hash-stable cross-engine and are
    deliberately excluded."""
    d = _d(duck)
    hour = f"cast(date_trunc('hour', ts) as {d['str']})"
    return f"""
      select {hour} as hour, event_type,
             count(*) as n_events,
             count(distinct user_id) as n_users,
             min(value) as min_value,
             max(value) as max_value
      from {events}
      group by {hour}, event_type
      order by hour, event_type
    """


SESSION_GAP_S = 1800


def sessionize_sql(duck: bool, events: str = "events") -> str:
    """Sessionization via window functions: a new session starts when the
    gap to the user's previous event exceeds SESSION_GAP_S.  Epoch seconds
    (bigint) keep the arithmetic engine-neutral."""
    # floor(): DuckDB epoch() keeps fractional seconds and its double->bigint
    # cast ROUNDS; Spark unix_timestamp() floors to whole seconds
    epoch = "floor(epoch(ts))" if duck else "unix_timestamp(ts)"
    return f"""
      with seq as (
        select user_id, cast({epoch} as bigint) as es,
               lag(cast({epoch} as bigint)) over (
                 partition by user_id order by {epoch}, event_id
               ) as prev_es
        from {events}
      ),
      marks as (
        select user_id, es,
               case when prev_es is null or es - prev_es > {SESSION_GAP_S}
                    then 1 else 0 end as is_start
        from seq
      )
      select user_id,
             cast(sum(is_start) as bigint) as n_sessions,
             count(*) as n_events,
             cast(max(es) - min(es) as bigint) as span_s
      from marks
      group by user_id
      order by user_id
    """


def top_users_sql(duck: bool, events: str = "events") -> str:
    """Top-20 users by event count (deterministic tiebreak on user_id)."""
    return f"""
      with counts as (
        select user_id, count(*) as n_events,
               count(distinct event_type) as n_types
        from {events} group by user_id
      ),
      top as (
        -- order+limit first (distributed top-k), THEN rank the 20 survivors:
        -- avoids a global single-partition window over all users
        select user_id, n_events, n_types
        from counts order by n_events desc, user_id asc limit 20
      )
      select user_id, n_events, n_types,
             cast(row_number() over (order by n_events desc, user_id asc)
                  as bigint) as rk
      from top
      order by rk
    """


def run(spark, sf_dir: str, sql_builder, **kw):
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(sql_builder(duck=False, **kw))
