"""The reference's deterministic generated mock tables as DataFrames.

Reproduces src/execution/mock_scan_executor.cpp (schemas :60-135, generators
:225-425; FIXTURES.md §A documents the formulas) so the .slt corpus that
scans `__mock_*` tables replays verbatim. All tables are pure
`spark.range(n)` + native expressions — generated distributively, no driver
materialization, so the 1M/10M leaderboard tables are as cheap as the tiny
ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

POOP = "\U0001f4a9"
INNOCENT = "\U0001f607"

_TA_2022 = [
    ("amstqq", "Tuesday"), ("durovo", "Wednesday"), ("joyceliaoo", "Monday"),
    ("karthik-ramanathan-3006", "Wednesday"), ("kush789", "Thursday"),
    ("lmwnshn", "Friday"), ("mkpjnx", "Wednesday"), ("skyzh", "Randomly"),
    ("thepinetree", "Tuesday"), ("timlee0119", "Monday"), ("yliang412", "Tuesday"),
]
_TA_2023 = [
    ("abigalekim", "Friday"), ("arvinwu168", "Thursday"),
    ("christopherlim98", "Tuesday"), ("David-Lyons", "Monday"),
    ("fanyuex2", "Tuesday"), ("Mayank-Baranwal", "Tuesday"),
    ("skyzh", "Randomly"), ("yarkhinephyo", "Wednesday"), ("yliang412", "Thursday"),
]
_TA_2023_FALL = [
    ("skyzh", "Randomly"), ("yliang412", "Tuesday"), ("fernandolis10", "Wednesday"),
    ("wiam8", "Tuesday"), ("anurag-23", "Thursday"), ("Mayank-Baranwal", "Tuesday"),
    ("abigalekim", "Friday"), ("ChaosZhai", "Yesterday"), ("aoleizhou", "Friday"),
    ("averyqi115", "Friday"), ("kswim8", "Never"),
]
_WEEKDAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]


def _agg_input(spark: SparkSession, n: int, v4_div: int, v6_mod: int) -> DataFrame:
    # NB: `div` everywhere — Spark's / is float division and e.g.
    # (c/1000) % 16 on c=1500 gives 1.5 % 16, not the reference's 1
    c = F.col("id")
    return spark.range(n).select(
        ((c + 2) % 10).cast("int").alias("v1"),
        c.cast("int").alias("v2"),
        ((c + 50) % 100).cast("int").alias("v3"),
        F.expr(f"cast(id div {v4_div} as int)").alias("v4"),
        F.lit(233).alias("v5"),
        F.repeat(F.lit(POOP), ((c % v6_mod) + 1).cast("int")).alias("v6"),
    )


def mock_tables(spark: SparkSession) -> dict[str, DataFrame]:
    c = F.col("id")
    t = {}
    t["__mock_table_1"] = spark.range(100).select(
        c.cast("int").alias("colA"), (c * 100).cast("int").alias("colB")
    )
    t["__mock_table_2"] = spark.range(100).select(
        F.concat(c.cast("string"), F.lit("-" + POOP)).alias("colC"),
        F.repeat(F.lit(INNOCENT), (c % 8).cast("int")).alias("colD"),
    )
    t["__mock_table_3"] = spark.range(100).select(
        F.when(c % 2 == 0, c.cast("int")).alias("colE"),
        F.concat(c.cast("string"), F.lit("-" + POOP)).alias("colF"),
    )
    for name, rows in (
        ("__mock_table_tas_2022", _TA_2022),
        ("__mock_table_tas_2023", _TA_2023),
        ("__mock_table_tas_2023_fall", _TA_2023_FALL),
    ):
        t[name] = spark.createDataFrame(
            rows, "github_id string, office_hour string"
        )
    t["__mock_table_schedule_2022"] = spark.createDataFrame(
        [(d, 1 if i in (1, 3) else 0) for i, d in enumerate(_WEEKDAYS)],
        "day_of_week string, has_lecture int",
    )
    t["__mock_table_schedule_2023"] = spark.createDataFrame(
        [(d, 1 if i in (0, 2) else 0) for i, d in enumerate(_WEEKDAYS)],
        "day_of_week string, has_lecture int",
    )
    t["__mock_agg_input_small"] = _agg_input(spark, 1000, 100, 8)
    t["__mock_agg_input_big"] = _agg_input(spark, 10000, 1000, 16)
    t["__mock_table_123"] = spark.range(3).select((c + 1).cast("int").alias("number"))
    t["__mock_graph"] = spark.range(100).selectExpr(
        "cast(id % 10 as int) as src",
        "cast(id div 10 as int) as dst",
        "format_string('%03d', cast(id % 10 as int)) as src_label",
        "format_string('%03d', cast(id div 10 as int)) as dst_label",
        "cast(if(id % 10 = id div 10, NULL, 1) as int) as distance",
    )
    # leaderboard tables; generated lazily — scanning them is a distributed
    # range + projection, no materialization
    t["__mock_t1"] = spark.range(1_000_000).selectExpr(
        "cast(id div 10000 as int) as x",
        "cast(id % 10000 as int) as y",
        "cast(id as int) as z",
    )
    for name, off in (("__mock_t4_1m", 0), ("__mock_t5_1m", 30000), ("__mock_t6_1m", 60000)):
        t[name] = spark.range(1_000_000).selectExpr(
            f"cast((id + {off}) % 500000 as int) as x",
            f"cast(((id + {off}) % 500000) * 10 as int) as y",
        )
    t["__mock_t7"] = spark.range(1_000_000).select(
        (c % 20).cast("int").alias("v"), c.cast("int").alias("v1"), c.cast("int").alias("v2")
    )
    t["__mock_t8"] = spark.range(10).select(c.cast("int").alias("v4"))
    t["__mock_t9"] = spark.range(10_000_000).selectExpr(
        "cast(id div 10000 as int) as x",
        "cast(10000000 - (id div 2 + ((id div 10000) % 2) * ((id div 2) % 2)) as int) as y",
    )
    return t


def register_mock_tables(spark: SparkSession) -> None:
    """Register every mock table as a temp view (idempotent)."""
    for name, df in mock_tables(spark).items():
        df.createOrReplaceTempView(name)
