"""The transcripts input table (BASELINE.json input_hint):
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.

Two deterministic sources:

1. :func:`transcripts_from_events` — a pure-SQL-expressible derivation from
   the driver's ``events`` parquet, so every sketch query over transcripts
   has an exact DuckDB oracle (:data:`TRANSCRIPTS_SQL` is the same
   derivation in ANSI SQL; the driver runs both sides).
2. :func:`synthesize_transcripts` — bench-scale generator built from
   ``spark.range`` + JVM column expressions only (no Python UDF, no
   driver-side data), with Zipf-style hot-key skew on ``conv_id`` to
   exercise salting (FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

# ANSI SQL equivalent of transcripts_from_events — runnable by DuckDB on the
# pre-registered `events` view.  Keep in exact sync with the Spark derivation.
TRANSCRIPTS_SQL = """
SELECT
  'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0')                AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1
       AS INTEGER)                                                 AS turn_idx,
  CASE CAST(event_id % 4 AS INTEGER)
       WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
       WHEN 2 THEN 'tool' ELSE 'system' END                        AS role,
  props                                                            AS text,
  CASE WHEN event_id % 4 = 2 THEN event_type ELSE NULL END         AS tool,
  ts                                                               AS ts
FROM events
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts view over ``{sf_dir}/events.parquet``.

    ``user_id`` plays conv_id (FIXTURES.md §2); dense turn_idx by event_id
    order — the stable (conv_id, turn_idx) ordering key of input_hint."""
    from .io import read_table
    ev = read_table(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        F.concat(F.lit("conv-"),
                 F.lpad(F.col("user_id").cast("string"), 8, "0")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_id") % 4 == 0, "user")
         .when(F.col("event_id") % 4 == 1, "assistant")
         .when(F.col("event_id") % 4 == 2, "tool")
         .otherwise("system").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_id") % 4 == 2, F.col("event_type"))
         .otherwise(F.lit(None).cast("string")).alias("tool"),
        F.col("ts").alias("ts"),
    )


def synthesize_transcripts(spark: SparkSession, n_turns: int,
                           n_convs: int | None = None,
                           hot_keys: int = 5,
                           hot_fraction: float = 0.01,
                           partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic transcripts at arbitrary scale.

    Pure ``spark.range`` + built-in column expressions — generation runs
    distributed, fully code-gen'd, no Arrow crossing.  ``hot_fraction`` of
    turns land on ``hot_keys`` conversations (skew fixture for salting).
    ``turn_idx`` is the per-conv insertion order key (monotone in ``id``;
    not dense, which no sketch semantics require)."""
    if n_convs is None:
        n_convs = max(n_turns // 50, 1)
    rng = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    h = F.xxhash64("id")
    h2 = F.xxhash64(F.lit(7), "id")
    hot_cut = int(hot_fraction * 1_000_000)
    conv_idx = (F.when(F.pmod(h, F.lit(1_000_000)) < hot_cut,
                       F.pmod(h2, F.lit(hot_keys)))
                 .otherwise(F.pmod(h2, F.lit(n_convs))))
    role_code = F.pmod(h, F.lit(100))
    role = (F.when(role_code < 42, "user")
             .when(role_code < 84, "assistant")
             .when(role_code < 86, "system")
             .otherwise("tool"))
    return rng.select(
        F.concat(F.lit("conv-"), F.lpad(conv_idx.cast("string"), 8, "0")
                 ).alias("conv_id"),
        F.pmod(h2, F.lit(1 << 30)).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(F.lit("tok"), F.pmod(h, F.lit(5000)).cast("string"),
                 F.lit(" "), F.md5(F.col("id").cast("string")),
                 F.lit(" "), F.md5(F.concat(F.lit("x"), F.col("id").cast("string")))
                 ).alias("text"),
        F.when(role == "tool",
               F.concat(F.lit("tool_"), F.pmod(h2, F.lit(12)).cast("string"))
               ).otherwise(F.lit(None).cast("string")).alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=(F.col("id") % 2_592_000).cast("double"))
         ).alias("ts"),
        F.col("id"),  # global insertion-order key for stable replay
    )
