"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; each ``queries()[name]`` runs at
sf=0.01 and is compared against ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

Implementation lives in ``sarkac_spark`` (registry:
``sarkac_spark/queries/``); this module only wires the driver contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sarkac_spark.operators.anomaly import sigma_scan
from sarkac_spark.queries import all_oracle_sql, all_queries
from sarkac_spark.queries.core import SIGMA_WINDOWS
from sarkac_spark.sources.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-window 3-sigma anomaly scan over events (sf0.001)."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return sigma_scan(events, windows=SIGMA_WINDOWS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle_sql()
