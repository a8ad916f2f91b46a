"""Structured log sink with rotation — the reference's bunyan
rotating-file logger (gateway.ts:15-33: info daily×7, error weekly×3)
re-expressed as date-partitioned parquet with partition-TTL retention.

At 100 TB this is the standard event-log layout: append-only writes
partitioned by (day, level), pruning on read, retention as partition
deletes (metadata-only, no rewrite).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Reference retention: info 7 days, error 3 weeks (gateway.ts:20-31).
RETENTION_DAYS = {"info": 7, "error": 21}


def write_log(df: DataFrame, path: str, mode: str = "append") -> None:
    """Append events as a partitioned log table.

    Expects columns `ts` (timestamp) and `level` (string); everything
    else is payload. Partition layout: day=YYYY-MM-DD/level=<level>.
    """
    (
        df.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode(mode)
        .partitionBy("day", "level")
        .parquet(path)
    )


def read_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def apply_retention(path: str, today: str) -> list[str]:
    """Delete partitions older than each level's retention, measured from
    `today` (YYYY-MM-DD). Returns the deleted partition dirs.

    Partition removal is a filesystem/metastore operation — no data
    rewrite — exactly how log rotation should scale."""
    import datetime as dt

    anchor = dt.date.fromisoformat(today)
    deleted: list[str] = []
    root = Path(path)
    for day_dir in sorted(root.glob("day=*")):
        day = dt.date.fromisoformat(day_dir.name.split("=", 1)[1])
        for level_dir in sorted(day_dir.glob("level=*")):
            level = level_dir.name.split("=", 1)[1]
            keep = RETENTION_DAYS.get(level, max(RETENTION_DAYS.values()))
            if (anchor - day).days > keep:
                shutil.rmtree(level_dir)
                deleted.append(str(level_dir))
        if not any(day_dir.iterdir()):
            day_dir.rmdir()
    return deleted
