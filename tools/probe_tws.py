"""Probe: can this environment run transformWithStateInPandas?

PySpark 4.x's arbitrary-stateful-v2 operator drives its Python<->JVM
state server over protobuf. This probe records (a) whether the API
exists, (b) whether the protobuf runtime exists, and (c) what actually
happens when a minimal TWS query starts — so the honest-negative in
BASELINE.md §tws is reproducible in one command.

Usage: python tools/probe_tws.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

result: dict = {"probe": "transformWithStateInPandas"}

try:
    import inspect

    from pyspark.sql.group import GroupedData

    sig = inspect.signature(GroupedData.transformWithStateInPandas)
    result["api_present"] = True
    result["api_signature"] = str(sig)
except Exception as e:  # noqa: BLE001
    result["api_present"] = False
    result["api_error"] = repr(e)

try:
    from google.protobuf import descriptor  # noqa: F401

    result["protobuf_present"] = True
except ImportError as e:
    result["protobuf_present"] = False
    result["protobuf_error"] = repr(e)

if result.get("api_present"):
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from sarkac_spark.session import get_spark

    class _P(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.st = handle.getValueState("st", "total long")

        def handleInputRows(self, key, rows, timerValues):
            tot = (self.st.get() or (0,))[0]
            for pdf in rows:
                tot += int(pdf["v"].sum())
            self.st.update((tot,))
            yield pd.DataFrame({"k": [key[0]], "total": [tot]})

    spark = get_spark("probe_tws", rocksdb_state=True)
    d = tempfile.mkdtemp(prefix="probe_tws_")
    src = os.path.join(d, "src")
    os.makedirs(src)
    spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long").coalesce(
        1
    ).write.parquet(os.path.join(src, "b000"))
    try:
        stream = spark.readStream.schema("k string, v long").parquet(
            os.path.join(src, "*")
        )
        out = stream.groupBy("k").transformWithStateInPandas(
            _P(), outputStructType="k string, total long",
            outputMode="append", timeMode="None",
        )
        q = (
            out.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        result["query_ran"] = True
    except Exception as e:  # noqa: BLE001
        result["query_ran"] = False
        msg = str(e)
        # surface the root cause the JVM wraps (ImportError from the
        # streaming python runner)
        marker = "ImportError:"
        result["query_error"] = (
            msg[msg.index(marker):].splitlines()[0]
            if marker in msg
            else msg.splitlines()[0][:300]
        )
    finally:
        spark.stop()

print(json.dumps(result))
