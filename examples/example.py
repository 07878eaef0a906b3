"""Full-config example mirroring the reference's example/example.js:
configure the DSL, subscribe to events, run the engine over the synthetic
message stream (the reference's produceExampleMessages fixture), and
inspect results over HTTP.

Run: python examples/example.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sarkac_spark.sarkac import Sarkac
from sarkac_spark.session import get_spark
from sarkac_spark.sources.synthetic import TOPIC, example_messages
from sarkac_spark.streaming.http_server import serve


def main() -> None:
    spark = get_spark("sarkac_example")
    tmp = tempfile.mkdtemp(prefix="sarkac_example_")

    # the reference fixture: steady baseline + planted spike/dip
    example_messages(spark, n=96).coalesce(1).write.parquet(f"{tmp}/src")
    envelope = (
        spark.readStream.schema("topic string, key string, value string, ts timestamp")
        .parquet(f"{tmp}/src")
    )

    config = {
        # example/example.js:26-39
        "dsl": {
            TOPIC: {
                "fields": {
                    "sub.one": {"windows": ["1m", "3m", "5m"]},
                    "two": {"windows": ["5m"]},
                }
            }
        },
        "discovery": {"topicBlacklist": []},
        "target": {"topic": "sarkac-detected-anomalies"},
    }

    sarkac = Sarkac(spark, config, work_dir=f"{tmp}/work")
    sarkac.on("anomaly", lambda a: print(f"ANOMALY {a['path']}={a['value']} ({a['human_window']})"))
    sarkac.on("message", lambda n: print(f"analysed {n} messages"))

    http = serve(sarkac, port=8033)
    query = sarkac.analyse(envelope, trigger_seconds=1)
    query.processAllAvailable()

    with urllib.request.urlopen("http://127.0.0.1:8033/status") as r:
        print("/status:", json.dumps(json.load(r), indent=2))

    print("\nstored anomalies:")
    sarkac.anomalies().select(
        "key", "topic", "path", "human_window", "value", "median", "three_sigma"
    ).orderBy("path", "human_window", "key").show(truncate=False)

    http.shutdown()
    sarkac.close()
    spark.stop()


if __name__ == "__main__":
    main()
