"""The Sarkac orchestrator facade end-to-end (reference example/example.js
usage shape) and MLlib anomaly operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from sarkac_spark.operators.mllib_anomaly import kmeans_anomaly
from sarkac_spark.sarkac import Sarkac
from sarkac_spark.sources.synthetic import TOPIC, example_messages


def test_sarkac_analyse_lifecycle(spark, tmp_path):
    src = str(tmp_path / "src")
    example_messages(spark, n=96).coalesce(1).write.parquet(src)
    envelope = (
        spark.readStream.schema("topic string, key string, value string, ts timestamp")
        .parquet(src)
    )

    config = {
        "dsl": {
            TOPIC: {
                "fields": {
                    "sub.one": {"windows": ["5m"]},
                    "two": {"windows": ["5m"]},
                }
            }
        },
        "discovery": {"topicBlacklist": ["internal"]},
        "target": {"topic": "sarkac-detected-anomalies"},
    }
    sarkac = Sarkac(spark, config, work_dir=str(tmp_path / "work"))
    anomalies_seen, messages_seen = [], []
    sarkac.on("anomaly", anomalies_seen.append)
    sarkac.on("message", messages_seen.append)

    q = sarkac.analyse(envelope, trigger_seconds=1)
    q.processAllAvailable()
    sarkac.close()

    assert sum(messages_seen) == 96
    # the default 2-min cooldown (reference DSLHandler.js:13) suppresses
    # most of the 12 planted anomalies: spikes 30 s apart -> keys 11, 59
    # emit on sub.one; dips 60 s apart -> keys 23, 71 emit on two
    by_path = {}
    for a in anomalies_seen:
        by_path.setdefault(a["path"], []).append(int(a["key"]))
    assert by_path == {"sub.one": [11, 59], "two": [23, 71]}

    stored = sarkac.anomalies()
    assert stored.count() == 4
    st = sarkac.get_status()
    assert st["stats"]["analysed_messages"] == 96
    assert st["stats"]["anomalies_detected"] == 4
    assert st["storedEvents"] == 96 * 2  # two fields per message


def test_kmeans_anomaly_flags_outliers(spark):
    # two real clusters (k=2, MLlib requires k>=2) + a moderate outlier:
    # it must stay inside a cluster at a large distance — an EXTREME
    # outlier would be SSE-cheaper as its own centroid and hide (inherent
    # distance-to-centroid caveat, documented in the operator)
    rows = [(i, 10.0 + (i % 5) * 0.1) for i in range(100)]
    rows += [(100 + i, 50.0 + (i % 5) * 0.1) for i in range(100)]
    rows += [(900, 70.0)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    out = kmeans_anomaly(df, ["value"], k=2, quantile=0.99)
    flagged = [r.event_id for r in out.filter("is_anomaly").collect()]
    assert 900 in flagged
    assert len(flagged) <= 5


def test_ml_queries_rows_only(spark):
    from sarkac_spark.queries.ml import QUERIES

    for name, fn in QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
