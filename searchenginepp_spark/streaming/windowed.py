"""Windowed event aggregation — the Structured Streaming surface.

The reference has no streaming (its builder is a bounded stdin pipeline,
SURVEY.md §2.3); this module adds the standard stream-analytics shape a
training-data platform needs: tumbling-window aggregates with event-time
watermarks for late data.

`windowed_event_counts` is written once and runs in BOTH modes:
  * batch DataFrame (the DuckDB-oracle path, time_bucket-equivalent),
  * readStream + withWatermark + window + writeStream (tested with the
    availableNow trigger against the batch answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW = "1 hour"
WATERMARK = "2 hours"


def windowed_event_counts(events: DataFrame, window: str = WINDOW,
                          watermark: str | None = None) -> DataFrame:
    """(window_start, event_type, n_events, sum_value) tumbling-window agg.
    Pass `watermark` only on streaming inputs (it bounds state; on batch it
    is a no-op semantically but blocks the oracle compare on some plans)."""
    # parquet event times may be TIMESTAMP_NTZ; watermarks require TIMESTAMP
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )


SESSION_GAP_S = 28_800          # 8h inactivity closes a session


def sessionize_events(events: DataFrame,
                      gap_seconds: int = SESSION_GAP_S) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events,
    sum_value) — classic gap-based sessionization: a new session starts when
    the user's inter-event gap exceeds `gap_seconds`.  Pure window functions
    (lag + running sum), one shuffle on user_id."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    is_new = (gap.isNull() | (gap > gap_seconds)).cast("long")
    marked = events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        marked.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
    )


def daily_event_stats(events: DataFrame) -> DataFrame:
    """(event_date, event_type, n_events, avg_k, sum_value) — scalar-function
    coverage: JSON field extraction from the props column + date bucketing
    (functions the reference lacks entirely, SURVEY.md §2.3)."""
    return (
        events
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .withColumn("event_date", F.to_date("ts"))
        .groupBy("event_date", "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.avg("k"), 6).alias("avg_k"),
             F.round(F.sum("value"), 6).alias("sum_value"))
    )


def stream_event_counts(spark: SparkSession, input_dir: str,
                        checkpoint_dir: str, window: str = WINDOW,
                        watermark: str = WATERMARK):
    """File-stream form: parquet dir → watermarked windowed agg. Returns the
    streaming DataFrame; caller attaches the sink (writeStream)."""
    schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return windowed_event_counts(stream, window, watermark)
