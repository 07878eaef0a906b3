"""Keyed-state pipelines under the RocksDB state store provider
(VERDICT round 5, item 5).

The default HDFS-backed store keeps all state versions on the executor
heap — a driver/executor-memory hazard at 100x keys. RocksDB
(off-heap + local disk) is the deployment shape; these tests prove the
``applyInPandasWithState`` pipelines run AND recover from a checkpoint
under it, on the bundled provider (no extra jars — RocksDB JNI ships
with Spark).

The provider class is a runtime SQL conf read at query START, so the
fixture flips it on the shared session and restores it afterwards —
no second SparkSession needed.
"""

from __future__ import annotations

import pytest

# e2e tier: real streaming queries / subprocess sessions — minutes each.
# Excluded from the default (driver-verify) fast run; the builder's
# once-per-round full run includes them (pytest -m "slow or not slow").
pytestmark = pytest.mark.slow


import pytest
from pyspark.sql import functions as F

from sarkac_spark.session import ROCKSDB_PROVIDER

_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb(spark):
    old = spark.conf.get(_CONF, None)
    spark.conf.set(_CONF, ROCKSDB_PROVIDER)
    yield spark
    if old is None:
        spark.conf.unset(_CONF)
    else:
        spark.conf.set(_CONF, old)


def test_stateful_sigma_kill_resume_under_rocksdb(rocksdb, tmp_path):
    """The sigma engine's recovery contract (state survives restart,
    sink stays exactly-once) holds under RocksDB: a killed-and-resumed
    run equals a never-stopped run byte-for-byte."""
    spark = rocksdb
    from sarkac_spark.config import DSL
    from sarkac_spark.sources.synthetic import TOPIC, example_messages
    from sarkac_spark.streaming.pipeline import StatefulSigmaPipeline

    dsl = DSL.parse({TOPIC: {"fields": {"sub.one": {"windows": ["5m"]}}}})
    msgs = example_messages(spark, n=96).collect()
    schema = "topic string, key string, value string, ts timestamp"

    def write_file(root, i):
        spark.createDataFrame(msgs[i * 32 : (i + 1) * 32], schema).coalesce(
            1
        ).write.parquet(str(root / "src" / f"b{i}"))

    def run(root):
        assert spark.conf.get(_CONF) == ROCKSDB_PROVIDER
        p = StatefulSigmaPipeline(
            spark, dsl, anomaly_dir=str(root / "anoms"), cooldown_seconds=0
        )
        q = p.start(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(root / "src" / "*")),
            checkpoint_dir=str(root / "ckpt"),
            trigger_seconds=1,
        )
        q.processAllAvailable()
        q.stop()

    ref_root = tmp_path / "single"
    ref_root.mkdir()
    for i in range(3):
        write_file(ref_root, i)
    run(ref_root)
    expect = sorted(
        (r.topic, r.path, r.event_ts_us, r.value, r.window_seconds)
        for r in spark.read.parquet(str(ref_root / "anoms")).collect()
    )
    assert expect  # fixture plants spikes

    rs_root = tmp_path / "restarted"
    rs_root.mkdir()
    write_file(rs_root, 0)
    write_file(rs_root, 1)
    run(rs_root)
    write_file(rs_root, 2)
    run(rs_root)  # fresh pipeline object, same RocksDB-backed checkpoint
    got = sorted(
        (r.topic, r.path, r.event_ts_us, r.value, r.window_seconds)
        for r in spark.read.parquet(str(rs_root / "anoms")).collect()
    )
    assert got == expect


def test_streaming_semantic_dedup_under_rocksdb(rocksdb, tmp_path):
    """The dedup twin's bucket-rep state lives in RocksDB too: stream
    run under the provider keeps exactly the batch survivors on an
    id-ordered arrival of exact duplicates."""
    spark = rocksdb
    import numpy as np

    from sarkac_spark.streaming.stateful_dedup import streaming_semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(8):
        rows.append((i, [float(x) for x in base[i]], i))
        rows.append((100 + i, [float(x) for x in base[i]], 100 + i))  # exact dup
    src = tmp_path / "src"
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, seq long"
    ).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("seq"))
    ).coalesce(1).write.parquet(str(src / "b0"))

    stream = (
        spark.readStream.schema(
            "vec_id long, embedding array<double>, seq long, ts timestamp"
        )
        .parquet(str(src / "*"))
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_semantic_dedup(stream, dim=16, n_bits=4, tau=0.99)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    res = spark.read.parquet(out_dir)
    kept = {r.vec_id for r in res.filter("kept = 1").collect()}
    assert kept == set(range(8))  # originals kept, dup ids 100+ dropped
    assert res.count() == 16
