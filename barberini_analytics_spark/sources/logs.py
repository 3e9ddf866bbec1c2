"""Log-file mining (SURVEY §2.1 S19, §2.10 M16).

Reference: multi-file glob read, 20k-line truncation, a multiline regex
extracting (worker, task, error/warning strings, final status) per task
run, and a per-task summary ``groupby(...).count().unstack()``
(src/diagnostics/log_report.py:91-257).

Spark-first: ``spark.read.text`` (glob → distributed scan, one row per
line with the source file name), per-line ``regexp_extract`` into typed
event columns, and the run reconstruction as a window: each line belongs
to the most recent ``running`` marker of its file — a last-value window
instead of the reference's quadratic multiline regex.  The summary pivot
is ``groupBy().pivot()`` (A8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

#: line shapes from the reference's STOP/PATTERN regexes
#: (log_report.py:25-87)
_RUN = r"^INFO:\s*\[pid\s*\d+\]\s+Worker\s+(\w+)\s*\(.*\)\s*running\s*(\w+)(\(.*\))\s*$"
_STATUS = r"^INFO:\s*Informed scheduler that task\s+(\w+)\s+has status\s+(\w+)"
_LOGLINE = r"^(ERROR|WARNING):(?!\s*\[pid .*\])(.+)$"


def read_logs(spark: SparkSession, glob: str,
              max_lines_per_file: int | None = 20_000) -> DataFrame:
    """Glob read with per-file line numbers (+ optional truncation, the
    reference caps files at 20k lines, log_report.py:250)."""
    lines = (spark.read.text(glob)
             .withColumn("file", F.input_file_name()))
    w = W.partitionBy("file").orderBy(F.monotonically_increasing_id())
    lines = lines.withColumn("line_no", F.row_number().over(w))
    if max_lines_per_file is not None:
        lines = lines.filter(F.col("line_no") <= max_lines_per_file)
    return lines


def extract_events(lines: DataFrame) -> DataFrame:
    """Typed event stream: task starts, status transitions, log messages —
    each line classified by one projection."""
    return lines.select(
        "file", "line_no", F.col("value").alias("raw"),
        F.nullif(F.regexp_extract("value", _RUN, 2), F.lit(""))
        .alias("task_started"),
        F.nullif(F.regexp_extract("value", _RUN, 1), F.lit(""))
        .alias("worker"),
        F.nullif(F.regexp_extract("value", _STATUS, 1), F.lit(""))
        .alias("status_task"),
        F.nullif(F.regexp_extract("value", _STATUS, 2), F.lit(""))
        .alias("status"),
        F.nullif(F.regexp_extract("value", _LOGLINE, 1), F.lit(""))
        .alias("log_level"),
        F.nullif(F.regexp_extract("value", _LOGLINE, 2), F.lit(""))
        .alias("log_message"),
    )


def attach_task_runs(events: DataFrame) -> DataFrame:
    """Assign every line to the most recent task start in its file (the
    run-reconstruction the reference does with its multiline regex)."""
    w = (W.partitionBy("file").orderBy("line_no")
         .rowsBetween(W.unboundedPreceding, 0))
    return events.withColumn(
        "current_task", F.last("task_started", ignorenulls=True).over(w))


def error_summary(events: DataFrame) -> DataFrame:
    """Per-task ERROR/WARNING counts — the report's summary table
    (``groupby().count().unstack()`` → ``pivot``, log_report.py:114-132)."""
    runs = attach_task_runs(events)
    return (runs.filter(F.col("log_level").isNotNull()
                        & F.col("current_task").isNotNull())
            .groupBy("current_task")
            .pivot("log_level", ["ERROR", "WARNING"])
            .count()
            .na.fill(0, ["ERROR", "WARNING"]))
