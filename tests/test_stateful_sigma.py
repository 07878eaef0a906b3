"""stateful_sigma_scan (keyed-state streaming scoring) must agree with
online_sigma_scan (the batch window-function twin) when the stream
delivers the same rows in event-time order across micro-batches."""

from __future__ import annotations

import pytest

# e2e tier: real streaming queries / subprocess sessions — minutes each.
# Excluded from the default (driver-verify) fast run; the builder's
# once-per-round full run includes them (pytest -m "slow or not slow").
pytestmark = pytest.mark.slow


import datetime as dt
import math

from pyspark.sql import functions as F

from sarkac_spark.operators.anomaly import online_sigma_scan
from sarkac_spark.streaming.stateful_sigma import stateful_sigma_scan

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "topic string, field_path string, produced timestamp, value double"


def _series(topic, path, points):
    return [
        (topic, path, T0 + dt.timedelta(seconds=s), float(v)) for s, v in points
    ]


def _fixture_rows():
    # steady baseline 10 +/- 1 every 10 s with planted spikes — the
    # reference fixture shape (example/produceExampleMessages.js)
    base = [(i * 10, 10 + (i % 3) - 1) for i in range(40)]
    spikes = [(95, 100.0), (205, -80.0), (395, 120.0)]
    rows = _series("t1", "value", base + spikes)
    rows += _series("t2", "a.b", [(i * 5, 50 + (i % 5)) for i in range(30)])
    rows += _series("t2", "a.b", [(77, 500.0)])
    return rows


def _run_stream(spark, tmp_path, rows, windows, n_files=3):
    rows = sorted(rows, key=lambda r: r[2])
    chunk = math.ceil(len(rows) / n_files)
    src = tmp_path / "sigma_src"
    for i in range(n_files):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, SCHEMA).coalesce(1).write.parquet(
                str(src / f"b{i}")
            )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = stateful_sigma_scan(stream, windows=windows)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sigma_out")
        .option("checkpointLocation", str(tmp_path / "sigma_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql("SELECT * FROM sigma_out").collect()


def test_stateful_sigma_matches_online_batch(spark, tmp_path):
    rows = _fixture_rows()
    windows = (120, 600)
    got = _run_stream(spark, tmp_path, rows, windows)

    df = spark.createDataFrame(rows, SCHEMA)
    expected = []
    for w in windows:
        batch = online_sigma_scan(
            df,
            group_cols=("topic", "field_path"),
            ts_col="produced",
            window_seconds=w,
            id_cols=(),
        ).withColumn("window_seconds", F.lit(w).cast("long"))
        expected.extend(batch.collect())

    def key(r):
        return (r.topic, r.path if hasattr(r, "path") else r.field_path,
                r.window_seconds, r.event_ts_us)

    got_map = {key(r): r for r in got}
    exp_map = {key(r): r for r in expected}
    assert set(got_map) == set(exp_map)
    assert got_map  # non-trivial: the planted spikes must be flagged
    for k, g in got_map.items():
        e = exp_map[k]
        assert g.value == e.value
        # batch stddev (Spark's merge formula) vs streaming prefix sums:
        # equal to float noise; both sides round to 6 digits already
        assert abs(g.median - e.median) < 1e-4
        assert abs(g.std_dev - e.std_dev) < 1e-4
        assert abs(g.three_sigma - e.three_sigma) < 1e-4


def test_stateful_sigma_spike_flagged_once_per_window(spark, tmp_path):
    rows = _series("t", "v", [(i * 10, 5.0 + (i % 2)) for i in range(20)])
    rows += _series("t", "v", [(145, 400.0)])
    got = _run_stream(spark, tmp_path, rows, windows=(300,), n_files=2)
    spikes = [r for r in got if r.value == 400.0]
    assert len(spikes) == 1
    assert abs(spikes[0].three_sigma) > 1
    # the steady baseline itself must not alert
    assert all(r.value == 400.0 for r in got)


def test_stateful_sigma_min_count_guard(spark, tmp_path):
    # only two prior points when the spike arrives -> no stats, no alert
    rows = _series("t", "v", [(0, 5.0), (10, 6.0), (20, 500.0)])
    got = _run_stream(spark, tmp_path, rows, windows=(300,), n_files=1)
    assert got == []


def test_stateful_pipeline_end_to_end(spark, tmp_path):
    """The pure-streaming engine over the reference fixture: envelope
    stream -> extract -> keyed-state scoring+cooldown -> file sink."""
    from sarkac_spark.config import DSL
    from sarkac_spark.sources.synthetic import TOPIC, example_messages
    from sarkac_spark.streaming.pipeline import StatefulSigmaPipeline

    dsl = DSL.parse(
        {TOPIC: {"fields": {"sub.one": {"windows": ["5m"]}, "two": {"windows": ["5m"]}}}}
    )
    msgs = example_messages(spark, n=96).collect()
    src = tmp_path / "env_src"
    for i in range(3):
        spark.createDataFrame(
            msgs[i * 32 : (i + 1) * 32],
            "topic string, key string, value string, ts timestamp",
        ).coalesce(1).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema("topic string, key string, value string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )

    p = StatefulSigmaPipeline(
        spark, dsl, anomaly_dir=str(tmp_path / "anoms"), cooldown_seconds=0
    )
    q = p.start(stream, checkpoint_dir=str(tmp_path / "ckpt"), trigger_seconds=1)
    q.processAllAvailable()
    q.stop()

    rows = spark.read.parquet(str(tmp_path / "anoms")).collect()
    # only planted values alert, on the right series, and every spike
    # that cleared the min-count guard is caught across batch boundaries
    assert rows
    assert {r.value for r in rows if r.path == "sub.one"} == {150.5}
    assert {r.value for r in rows if r.path == "two"} == {-100.0}
    assert all(r.window_seconds == 300 for r in rows)
    n_spikes = len([r for r in rows if r.path == "sub.one"])
    assert n_spikes >= 6  # 96 msgs / spike-every-12, minus warmup


def test_stateful_pipeline_cooldown_suppresses(spark, tmp_path):
    from sarkac_spark.config import DSL
    from sarkac_spark.sources.synthetic import TOPIC, example_messages
    from sarkac_spark.streaming.pipeline import StatefulSigmaPipeline

    dsl = DSL.parse({TOPIC: {"fields": {"sub.one": {"windows": ["5m"]}}}})
    src = tmp_path / "env_src2"
    example_messages(spark, n=96).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(
        "topic string, key string, value string, ts timestamp"
    ).parquet(str(src))
    p = StatefulSigmaPipeline(
        spark, dsl, anomaly_dir=str(tmp_path / "anoms2"), cooldown_seconds=3600
    )
    q = p.start(stream, checkpoint_dir=str(tmp_path / "ckpt2"), trigger_seconds=1)
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(str(tmp_path / "anoms2")).collect()
    assert len(rows) == 1  # emit-then-suppress: one alert per hour per series
    assert rows[0].value == 150.5


def test_stateful_pipeline_checkpoint_restart_equals_single_run(spark, tmp_path):
    """Kill-and-resume correctness: run the engine over the first two
    thirds of the fixture, stop, deliver the rest, restart a FRESH
    pipeline object on the same checkpoint — the combined output must
    equal a never-stopped run byte-for-byte. This pins both halves of
    the recovery contract: keyed state survives the restart (later
    spikes are scored against pre-restart baselines, not a cold
    min-count guard) and the file sink's commit log keeps pre-restart
    epochs exactly-once (no duplicated anomalies)."""
    from sarkac_spark.config import DSL
    from sarkac_spark.sources.synthetic import TOPIC, example_messages
    from sarkac_spark.streaming.pipeline import StatefulSigmaPipeline

    dsl = DSL.parse(
        {TOPIC: {"fields": {"sub.one": {"windows": ["5m"]}, "two": {"windows": ["5m"]}}}}
    )
    msgs = example_messages(spark, n=96).collect()
    schema = "topic string, key string, value string, ts timestamp"

    def write_file(root, i):
        spark.createDataFrame(msgs[i * 32 : (i + 1) * 32], schema).coalesce(
            1
        ).write.parquet(str(root / "src" / f"b{i}"))

    def read_stream(root):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(root / "src" / "*"))
        )

    def run(root):
        p = StatefulSigmaPipeline(
            spark, dsl, anomaly_dir=str(root / "anoms"), cooldown_seconds=0
        )
        q = p.start(
            read_stream(root), checkpoint_dir=str(root / "ckpt"), trigger_seconds=1
        )
        q.processAllAvailable()
        q.stop()

    # reference: never-stopped run over all three files
    ref_root = tmp_path / "single"
    ref_root.mkdir()
    for i in range(3):
        write_file(ref_root, i)
    run(ref_root)
    expect = sorted(
        (r.topic, r.path, r.event_ts_us, r.value, r.window_seconds)
        for r in spark.read.parquet(str(ref_root / "anoms")).collect()
    )
    assert expect  # fixture plants spikes; empty would vacuously pass

    # restart: two files -> stop -> third file -> fresh pipeline, same ckpt
    rs_root = tmp_path / "restarted"
    rs_root.mkdir()
    write_file(rs_root, 0)
    write_file(rs_root, 1)
    run(rs_root)
    mid = len(spark.read.parquet(str(rs_root / "anoms")).collect())
    write_file(rs_root, 2)
    run(rs_root)  # new object, same checkpoint + sink
    got = sorted(
        (r.topic, r.path, r.event_ts_us, r.value, r.window_seconds)
        for r in spark.read.parquet(str(rs_root / "anoms")).collect()
    )
    assert got == expect
    assert mid < len(got)  # the third file contributed post-restart spikes


def test_checkpoint_upgrade_from_union_shaped_extraction(spark, tmp_path):
    """Operational guarantee for round 4's extraction rewrite: a
    checkpoint written by the OLD single-topic plan (per-topic
    filter+stack, the pre-rewrite shape) must be resumable by the NEW
    CASE+explode plan — same single source occurrence, same stateful
    operator layout — with state intact (post-upgrade spikes score
    against pre-upgrade baselines) and no reprocessing."""
    from pyspark.sql import functions as F

    import sarkac_spark.streaming.pipeline as pl
    from sarkac_spark.config import DSL
    from sarkac_spark.operators.fields import dsl_field_exprs, to_sigma_store
    from sarkac_spark.sources.synthetic import TOPIC, example_messages
    from sarkac_spark.streaming.pipeline import StatefulSigmaPipeline

    def old_extract(df, dsl, payload_schemas=None):
        parts = []
        for t in dsl.topics.values():
            if not t.fields:
                continue
            exprs = dsl_field_exprs("value", [f.path for f in t.fields])
            parts.append(
                to_sigma_store(
                    df.filter(F.col("topic") == t.topic),
                    topic_col="topic",
                    ts_col="ts",
                    fields=exprs,
                    extra_cols=["key"],
                )
            )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    dsl = DSL.parse(
        {TOPIC: {"fields": {"sub.one": {"windows": ["5m"]}, "two": {"windows": ["5m"]}}}}
    )
    msgs = example_messages(spark, n=96).collect()
    schema = "topic string, key string, value string, ts timestamp"
    src = tmp_path / "src"

    def run(extract_impl):
        saved = pl.extract_fields
        pl.extract_fields = extract_impl
        try:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(str(src / "*"))
            )
            p = StatefulSigmaPipeline(
                spark, dsl, anomaly_dir=str(tmp_path / "anoms"), cooldown_seconds=0
            )
            q = p.start(
                stream, checkpoint_dir=str(tmp_path / "ckpt"), trigger_seconds=1
            )
            q.processAllAvailable()
            q.stop()
        finally:
            pl.extract_fields = saved

    # phase 1: OLD plan writes the checkpoint
    spark.createDataFrame(msgs[:48], schema).coalesce(1).write.parquet(str(src / "b0"))
    run(old_extract)
    pre = spark.read.parquet(str(tmp_path / "anoms")).count()
    assert pre > 0

    # phase 2: NEW plan resumes the same checkpoint over new data
    spark.createDataFrame(msgs[48:], schema).coalesce(1).write.parquet(str(src / "b1"))
    run(pl.extract_fields)
    rows = spark.read.parquet(str(tmp_path / "anoms")).collect()
    assert len(rows) > pre  # new data scored, no crash, no offset reset
    # all 8 planted spikes and 4 dips scored — including the second
    # half's, which need the pre-upgrade keyed baselines (>=3 prior
    # points) to clear the min-count guard at all
    assert len([r for r in rows if r.path == "sub.one" and r.value == 150.5]) == 8
    assert len([r for r in rows if r.path == "two" and r.value == -100.0]) == 4


def test_stateful_pipeline_cooldown_survives_restart(spark, tmp_path):
    """Cooldown is part of the keyed state, so it must survive a
    checkpoint restart: the fixture's first spike alerts before the
    stop, and every post-restart spike stays inside the 1 h cooldown —
    a cold cooldown cell would re-alert immediately."""
    from sarkac_spark.config import DSL
    from sarkac_spark.sources.synthetic import TOPIC, example_messages
    from sarkac_spark.streaming.pipeline import StatefulSigmaPipeline

    dsl = DSL.parse({TOPIC: {"fields": {"sub.one": {"windows": ["5m"]}}}})
    msgs = example_messages(spark, n=96).collect()
    schema = "topic string, key string, value string, ts timestamp"
    root = tmp_path / "cdr"
    root.mkdir()

    def write_file(i):
        spark.createDataFrame(msgs[i * 32 : (i + 1) * 32], schema).coalesce(
            1
        ).write.parquet(str(root / "src" / f"b{i}"))

    def run():
        p = StatefulSigmaPipeline(
            spark, dsl, anomaly_dir=str(root / "anoms"), cooldown_seconds=3600
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

    write_file(0)
    write_file(1)
    run()
    first = spark.read.parquet(str(root / "anoms")).collect()
    assert len(first) == 1 and first[0].value == 150.5
    write_file(2)
    run()  # fresh pipeline object, same checkpoint
    after = spark.read.parquet(str(root / "anoms")).collect()
    assert len(after) == 1  # later spikes stayed suppressed across restart
