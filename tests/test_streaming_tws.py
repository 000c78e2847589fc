"""transformWithStateInPandas twin (Spark 4's modern custom-state API):
final state must equal the batch aggregate and the
applyInPandasWithState twin on a closed input.

The API requires the RocksDB state store provider; the tests set the
session conf around query start and restore the prior provider so the
rest of the suite keeps the default (HDFS-backed) provider.
"""

from __future__ import annotations

import contextlib
import importlib.util

import pytest

# transformWithState's Python<->JVM state protocol is protobuf-based;
# the container ships pyspark without the protobuf package, so these
# tests (not the operator) are environment-gated. On a cluster with
# protobuf installed they run as-is.
def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent 'google' namespace absent
        return False


pytestmark = pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState needs the protobuf package (absent in this container)",
)

from distributed_mapreduce_spark.streaming.events_stream import (
    read_events_stream,
    run_to_memory,
    stateful_user_counts_tws,
)
from distributed_mapreduce_spark.workload.registry import table

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@contextlib.contextmanager
def rocksdb_state(spark):
    prior = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prior)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_tws") / "landing")
    ev = table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


def _final_counts(spark, name):
    # update-mode memory sink appends per batch; cumulative counts are
    # monotone so the max per user is the final state.
    got: dict[int, int] = {}
    for r in spark.table(name).collect():
        got[r["user_id"]] = max(got.get(r["user_id"], 0), r["n_events"])
    return got


def test_tws_final_state_matches_batch(spark, events_dir):
    with rocksdb_state(spark):
        stream = stateful_user_counts_tws(read_events_stream(spark, events_dir))
        run_to_memory(stream, "tws_stream", output_mode="update")
    got = _final_counts(spark, "tws_stream")
    expected = {
        r["user_id"]: r["count"]
        for r in spark.read.parquet(events_dir).groupBy("user_id").count().collect()
    }
    assert got == expected and len(got) > 0


def test_tws_multi_batch_state_carries(spark, events_dir):
    """One file per micro-batch: the ValueState must carry the count
    across batches (the whole point of the state store)."""
    with rocksdb_state(spark):
        stream = stateful_user_counts_tws(
            read_events_stream(spark, events_dir, max_files_per_trigger=1)
        )
        run_to_memory(stream, "tws_multibatch", output_mode="update")
    got = _final_counts(spark, "tws_multibatch")
    expected = {
        r["user_id"]: r["count"]
        for r in spark.read.parquet(events_dir).groupBy("user_id").count().collect()
    }
    assert got == expected
