"""sarkac_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of nodefluent/sarkac (reference: a Node.js
Kafka streaming 3-sigma anomaly detector; see SURVEY.md).

This is NOT a port: the reference delegates all relational work to MongoDB
aggregation pipelines (reference lib/db/model/SigmaModel.js:47-143); here
every operator is expressed as a declarative DataFrame / SQL plan so
Catalyst + Tungsten choose the physical strategy, and streaming semantics
live in Structured Streaming.

Layout
------
- ``session``    : SparkSession builder tuned for local[N] and cluster use
- ``config``     : the DSL (topic -> field -> windows) model + duration parse
- ``sources``    : parquet test tables, Kafka source/sink builders, synthetic
- ``functions``  : scalar expression helpers (paths, hashing, sigma score)
- ``operators``  : batch operators (stats, anomaly, discovery, dedup,
                   similarity, text, multimodal)
- ``streaming``  : streaming lift (pipeline assembly, cooldown, listener)
"""

__version__ = "0.1.0"
