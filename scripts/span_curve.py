#!/usr/bin/env python
"""Scale CURVES for the two round-10 skew/scale claims (r10 verdict
item 3): substring-span dedup throughput and the LSH hot-bucket guard,
each at 2-3 corpus sizes, so the 100 TB extrapolation rests on an
observed scaling exponent, not a single point.

Per size the record carries wall seconds, corpus tokens, tokens/s,
found-vs-planted span counts, and the shuffle bytes the run moved
(AppStatusStore delta — the direct measurement behind "the only
corpus-size shuffle is the fingerprint aggregate").

Usage: python scripts/span_curve.py [span_sizes_k] [hot_sizes_k]
  e.g. python scripts/span_curve.py 100,400,1000 50,100,200
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from barberini_analytics_spark.core.cache import (  # noqa: E402
    release_scoped, scope_mark, scoped_checkpoint)
from barberini_analytics_spark.core.metrics import (  # noqa: E402
    cumulative_shuffle_bytes)
from barberini_analytics_spark.core.session import get_spark  # noqa: E402
from barberini_analytics_spark.core.synthdata import (  # noqa: E402
    hot_bucket_corpus, planted_span_corpus)
from barberini_analytics_spark.operators import dedup as D  # noqa: E402


def main() -> None:
    span_sizes = [int(float(s) * 1000) for s in
                  (sys.argv[1] if len(sys.argv) > 1
                   else "100,400,1000").split(",")]
    hot_sizes = [int(float(s) * 1000) for s in
                 (sys.argv[2] if len(sys.argv) > 2
                  else "50,100,200").split(",")]

    spark = get_spark("barberini-span-curve")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write \
        .format("noop").mode("overwrite").save()

    out: dict[str, object] = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "loadavg_start": round(os.getloadavg()[0], 2),
    }

    # ---- span-dedup curve: planted passages, k=20 --------------------
    span_curve = []
    for n_docs in span_sizes:
        # scoped checkpoint: DataFrame.unpersist after localCheckpoint
        # is a no-op (core/cache.py contract), so the bare variant
        # accumulated every size's corpus in storage and pressured the
        # largest measurements — release_scoped below frees the blocks
        corpus = scoped_checkpoint(planted_span_corpus(spark, n_docs))
        sh0 = cumulative_shuffle_bytes(spark)
        t0 = time.perf_counter()
        agg = D.dedup_spans(corpus, "doc_id", k=20).agg(
            F.sum("n_tokens").alias("tok"),
            F.sum("n_dup_spans").alias("spans"),
            F.sum("n_dup_span_tokens").alias("cut")).first()
        dt = time.perf_counter() - t0
        span_curve.append({
            "n_docs": n_docs,
            "corpus_tokens": int(agg["tok"]),
            "n_spans": int(agg["spans"]),
            # planted truth: one copy per carrier doc minus the template
            # pool's global first occurrences
            "planted_spans": n_docs // 10 - 100,
            "cut_tokens": int(agg["cut"]),
            "sec": round(dt, 2),
            "tokens_per_sec": int(agg["tok"] / dt),
            "shuffle_mb": round(
                (cumulative_shuffle_bytes(spark) - sh0) / 1e6, 1),
            "loadavg1m": round(os.getloadavg()[0], 2),
        })
        release_scoped()  # occurrence caches AND the corpus checkpoint
        print(json.dumps({"span_progress": span_curve[-1]}),
              file=sys.stderr, flush=True)
    out["span_dedup_k20"] = span_curve

    # ---- hot-bucket guard curve: 5% degenerate bucket ----------------
    # guarded (max_bucket=1000) at every size; unguarded only where the
    # quadratic pair count stays tractable, so the curve still shows the
    # exponent without a multi-hour tail
    hot_curve = []
    for n_docs in hot_sizes:
        corpus = scoped_checkpoint(hot_bucket_corpus(spark, n_docs))
        # mark AFTER the corpus checkpoint: the per-tag release below
        # must free only the minhash run's scoped persists — releasing
        # the whole tier would free the corpus checkpoint too, and a
        # freed checkpoint RAISES on the second tag's reuse
        # (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), per the core/cache
        # contract
        mark = scope_mark()
        row: dict[str, object] = {
            "n_docs": n_docs,
            "hot_docs": n_docs // 20,
            "uncapped_pairs": (n_docs // 20) * (n_docs // 20 - 1) // 2,
        }
        for tag, cap in (("guarded", 1000), ("uncapped", None)):
            if cap is None and n_docs > 200_000:
                row["uncapped_sec"] = "skipped (quadratic)"
                continue
            sh0 = cumulative_shuffle_bytes(spark)
            t0 = time.perf_counter()
            n_pairs = D.minhash_near_duplicates(
                corpus, "doc_id", max_bucket=cap).count()
            dt = time.perf_counter() - t0
            row[f"{tag}_sec"] = round(dt, 2)
            row[f"{tag}_pairs"] = n_pairs
            row[f"{tag}_shuffle_mb"] = round(
                (cumulative_shuffle_bytes(spark) - sh0) / 1e6, 1)
            # the guarded/uncapped runs share an identical shingle +
            # signature logical plan — without a release the second
            # run silently reuses the first's scoped persist and
            # measures a warm cache, not the pipeline
            release_scoped(since=mark)
        row["loadavg1m"] = round(os.getloadavg()[0], 2)
        hot_curve.append(row)
        release_scoped()  # frees the corpus checkpoint blocks
        print(json.dumps({"hot_progress": row}), file=sys.stderr,
              flush=True)
    out["hot_bucket_guard"] = hot_curve

    print(json.dumps(out))


if __name__ == "__main__":
    main()
