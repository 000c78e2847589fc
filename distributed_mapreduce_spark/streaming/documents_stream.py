"""Structured Streaming over the `documents` table shape — streaming
near-duplicate suppression for a continuously-landing corpus.

Twin certification (same methodology as
:mod:`distributed_mapreduce_spark.streaming.events_stream`): on a
closed input the final per-key state of the streaming dedup equals the
batch `dedup_exact` answer — asserted in tests/test_streaming.py with
an availableNow trigger and maxFilesPerTrigger=1 so the state truly
carries across micro-batches.

Scale shape: state is partitioned by the content hash exactly like a
shuffle — one (keep_id, cnt) row per distinct document body, never the
text itself. Documents carry no event time, so the state here is
unbounded by design (a dedup horizon is a policy choice: bound it by
keying on (hash, ingest-day) or by a TTL timeout when the corpus
contract allows re-admitting old content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: documents schema (matches /root/testdata/sf*/documents.parquet).
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a landing directory of documents parquet.
    `max_files_per_trigger` throttles files per micro-batch (tests use 1
    to force multi-batch state carry-over)."""
    r = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(directory)


def dedup_docs_stream(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup: keyed state per content hash carrying
    (canonical keep_id = min doc_id seen, duplicate count) across
    micro-batches via `applyInPandasWithState` — the streaming twin of
    the batch `dedup_exact` query (`workload/dedup.py`), emitting one
    updated (fp, keep_id, cnt) row per touched key per batch (update
    mode — never a full state dump).

    Grouping on the 128-bit md5 instead of the text keeps both the
    shuffle and the state store tiny regardless of document size, same
    as the batch plan."""
    import pandas as pd  # local: keep module import light
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "fp string, keep_id bigint, cnt bigint"
    state_schema = "keep_id bigint, cnt bigint"

    def fn(key, pdfs, state):
        keep, cnt = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                keep = m if keep is None else min(keep, m)
                cnt += len(pdf)
        state.update((keep, cnt))
        yield pd.DataFrame({"fp": [key[0]], "keep_id": [keep], "cnt": [cnt]})

    fps = docs.select(F.md5(F.col("text")).alias("fp"), "doc_id")
    return fps.groupBy("fp").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
