"""Driver queries for the multimodal and log-mining layers.

``media_pipeline`` is oracle-checked end-to-end, including the raw
manifest columns (``n_bytes`` / ``payload_hex``): both engines build the
identical synthetic payload bytes and compare them as hex — so the
binary-column plumbing (headers, concat, utf-8 encode) is verified
bit-exact alongside the decode/feature/frame-sample derivations.

``log_event_summary`` synthesizes a log-line stream from events in both
engines and checks the regex event extraction + run attribution + pivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.io import load_table
from ..multimodal import media as M
from ..sources import logs as L
from .registry import query


#: the synthetic payload blob, as DuckDB SQL (shared with the manifest)
_PAYLOAD_SQL = """
    '\\x53\\x59\\x4E\\x4D'::BLOB
    || unhex(lpad(hex(doc_id % 3), 2, '0'))
    || unhex(lpad(hex((doc_id % 64 + 1) * 16), 4, '0'))
    || unhex(lpad(hex((doc_id % 36 + 1) * 16), 4, '0'))
    || unhex(lpad(hex(doc_id % 120 + 1), 4, '0'))
    || encode(text)
"""


@query(
    "media_pipeline",
    oracle=f"""
    WITH p AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               CAST((doc_id % 64 + 1) * 16 AS INT) AS width,
               CAST((doc_id % 36 + 1) * 16 AS INT) AS height,
               CAST(doc_id % 120 + 1 AS INT) AS n_frames,
               CAST(octet_length(encode(text)) AS BIGINT)
                   AS n_payload_bytes,
               sha256(hex({_PAYLOAD_SQL})) AS digest,
               CAST(octet_length({_PAYLOAD_SQL}) AS BIGINT) AS n_bytes,
               hex({_PAYLOAD_SQL}) AS payload_hex
        FROM documents
    )
    SELECT media_id, kind, width, height, n_frames, n_payload_bytes,
           n_bytes, payload_hex,
           array_to_string(list_transform(range(0, 8), i ->
               printf('%.6f', CAST(CAST(list_sum(
                   list_transform(range(0, 8), j ->
                       (strpos('0123456789abcdef',
                               substring(digest, 8 * i + j + 1, 1)) - 1)
                       * power(16, 7 - j))
               ) / 4294967296.0 AS REAL) AS DOUBLE))), ',')
               AS features_csv,
           CASE WHEN kind = 'video'
                THEN CAST((n_frames - 1) // 10 + 1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS n_sampled_frames
    FROM p
    """,
)
def media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode (SYNM header branch of the sniffing dispatcher; the real
    BMP/WAV/Y4M decoders are exercised in tests/test_codecs.py) +
    deterministic feature extraction + frame sampling over the media table
    in one frame — the three ``mapInPandas`` paths (decode,
    feature-extract, frame fan-out) hash-checked end-to-end: the oracle rebuilds the payload bytes, reproduces the
    sha256-over-hex feature digest (digit-parsed into the same
    uint32/2^32 floats, through the same float32 rounding), and derives
    the frame-sample fan-out count ``ceil(n_frames / every_n)``
    relationally.  Per-path determinism is additionally pinned in
    tests/test_multimodal_sources.py.

    The ``features`` array is flattened to a CSV string so the frame
    remains canonicalizable by the driver's pandas sort.
    """
    media = M.blob_repartition(M.synth_media(spark, sf_dir))
    decoded = M.decode_media(media)
    feats = M.extract_features(media, dim=8)
    frames = (M.sample_frames(M.synth_media(spark, sf_dir), every_n=10)
              .groupBy("media_id")
              .agg(F.count(F.lit(1)).alias("n_sampled_frames")))
    # raw-bytes manifest at the same grain (bit-exact payload check —
    # consolidated here because the driver records at most 50 entries)
    manifest = M.synth_media(spark, sf_dir).select(
        "media_id",
        F.length("data").cast("long").alias("n_bytes"),
        F.hex("data").alias("payload_hex"))
    return (
        decoded.join(feats, "media_id")
        .join(frames, "media_id", "left")
        .join(manifest, "media_id")
        .select(
            "media_id", "kind", "width", "height", "n_frames",
            "n_payload_bytes", "n_bytes", "payload_hex",
            F.array_join(
                F.transform("features",
                            lambda x: F.format_number(x, 6)), ",")
            .alias("features_csv"),
            F.coalesce("n_sampled_frames", F.lit(0)).cast("long")
            .alias("n_sampled_frames"),
        )
    )


# ---------------------------------------------------------------------------
# log mining (S19/M16)
# ---------------------------------------------------------------------------

_LOG_LINES_SQL = """
    log_lines AS (
        SELECT 'f' || CAST(user_id % 4 AS VARCHAR) AS file,
               CAST(row_number() OVER (PARTITION BY user_id % 4
                   ORDER BY event_id) AS INT) AS line_no,
               CASE event_type
                   WHEN 'view' THEN 'INFO: [pid 7] Worker w'
                       || CAST(user_id AS VARCHAR) || ' (s=1) running Task'
                       || CAST(event_id % 5 AS VARCHAR) || '(p=1)'
                   WHEN 'error' THEN 'ERROR: failure '
                       || CAST(event_id AS VARCHAR)
                   WHEN 'click' THEN 'WARNING: slow '
                       || CAST(event_id AS VARCHAR)
                   ELSE 'INFO: noise' END AS value
        FROM events)
"""


@query(
    "log_event_summary",
    oracle=f"""
    WITH {_LOG_LINES_SQL},
    events_x AS (
        SELECT file, line_no,
               NULLIF(regexp_extract(value,
                   '^INFO: \\[pid 7\\] Worker (\\w+) \\(s=1\\) running (\\w+)\\(p=1\\)$',
                   2), '') AS task_started,
               CASE WHEN value LIKE 'ERROR:%' THEN 'ERROR'
                    WHEN value LIKE 'WARNING:%' THEN 'WARNING'
                    END AS log_level
        FROM log_lines),
    runs AS (
        SELECT *, last_value(task_started IGNORE NULLS) OVER (
                   PARTITION BY file ORDER BY line_no
                   ROWS UNBOUNDED PRECEDING) AS current_task
        FROM events_x)
    SELECT current_task,
           CAST(COUNT(*) FILTER (WHERE log_level = 'ERROR') AS BIGINT)
               AS ERROR,
           CAST(COUNT(*) FILTER (WHERE log_level = 'WARNING') AS BIGINT)
               AS WARNING
    FROM runs
    WHERE log_level IS NOT NULL AND current_task IS NOT NULL
    GROUP BY current_task
    """,
)
def log_event_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S19/M16: regex event extraction + run attribution (last-start
    window) + per-task ERROR/WARNING pivot, over a log-line stream
    synthesized from events identically in both engines."""
    events = load_table(spark, sf_dir, "events")
    lines = events.selectExpr(
        "'f' || CAST(user_id % 4 AS STRING) AS file",
        "CAST(row_number() OVER (PARTITION BY user_id % 4"
        " ORDER BY event_id) AS INT) AS line_no",
        "CASE event_type"
        " WHEN 'view' THEN 'INFO: [pid 7] Worker w' || CAST(user_id AS STRING)"
        "   || ' (s=1) running Task' || CAST(event_id % 5 AS STRING)"
        "   || '(p=1)'"
        " WHEN 'error' THEN 'ERROR: failure ' || CAST(event_id AS STRING)"
        " WHEN 'click' THEN 'WARNING: slow ' || CAST(event_id AS STRING)"
        " ELSE 'INFO: noise' END AS value")
    extracted = L.extract_events(lines)
    return (L.error_summary(extracted)
            .withColumnRenamed("current_task", "current_task")
            .select("current_task",
                    F.col("ERROR").cast("long").alias("ERROR"),
                    F.col("WARNING").cast("long").alias("WARNING")))
