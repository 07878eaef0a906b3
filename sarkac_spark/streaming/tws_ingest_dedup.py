"""TwsDedupPipeline — the ``transformWithStateInPandas`` twin of
``StatefulDedupPipeline`` (PySpark >= 4.0's arbitrary-stateful-v2 API).

Why a second keyed-state engine: ``applyInPandasWithState`` has two
measured limitations this API lifts —

1. **Onboarding.** The apply engine cannot accept batch-built state, so
   ``bootstrap_state`` pays a seed trigger whose wall is the operator's
   own ~1.3 ms·core/key harness floor (604 s for 2M docs / ~10M band
   keys; ``tools/probe_state_floor.py``). ``transformWithStateInPandas``
   takes ``initialState=`` (a batch ``GroupedData`` on the same key) —
   Spark feeds each key's corpus rows to ``handleInitialState`` during
   the FIRST batch of the production query itself: one shuffle, no
   separate seed query, no second pass over the corpus.
2. **TTL x availableNow.** The apply engine implements the idle-TTL via
   ``ProcessingTimeTimeout`` + per-key timers, which makes an
   ``availableNow`` drain never terminate (the ``start()`` guard in the
   apply engine). Here TTL is NATIVE per-value state
   (``getValueState(..., ttlDurationMs=...)``) — no timers, so
   batch-style catch-up drains stay legal in TTL mode.

Verdict parity by construction: both engines call the SAME pure cores
(``_verify_batch`` / ``_seed_members`` in ``stateful_ingest_dedup``) —
pinned by ``tests/test_tws_ingest_dedup.py`` (mock-state parity runs in
any environment; end-to-end parity is protobuf-gated, below).

TTL-semantics note (the one intentional divergence): the apply engine's
TTL is a sliding IDLE clock — any batch that touches a band (even a
read-only dup drop) re-arms it via ``setTimeoutDuration``. Native TWS
value-TTL re-arms only on ``update``, so this engine REWRITES the
unchanged state value on read-touches in TTL mode to keep the same
sliding-idle contract. Expiry differs mechanically (value expires in
place and ``get()`` returns ``None``; nothing is "evicted" by a timer
batch) but observable dedup behavior matches: an idle band past the TTL
re-admits its next duplicate.

ENVIRONMENT STATUS (recorded honestly, the Kafka pattern): PySpark
4.1.2's ``transformWithStateInPandas`` drives its Python<->JVM state
server over protobuf. This sandbox has NO ``google.protobuf`` runtime
(and installs are out of scope), so the engine cannot EXECUTE here —
the query fails at planning with ``ImportError: cannot import name
'descriptor' from 'google.protobuf'`` inside Spark's
``StreamingPythonRunner`` (see ``tools/probe_tws.py``, which records
the exact failure). Everything that does not need the state server is
tested in-sandbox (processor logic parity with mock state); the
end-to-end tests run under ``pytest -m tws`` when the environment
grows a protobuf runtime. ``tws_available()`` is the gate.

Reference scope: the reference engine (nodefluent/sarkac, lib/ — a
Node.js stream processor) has no dedup/state-onboarding surface; this
module belongs to the beyond-reference LLM-pipeline mandate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import BooleanType, StructField, StructType

from sarkac_spark.operators.dedup import MINHASH_MAX_BAND_DF
from sarkac_spark.session import ROCKSDB_PROVIDER
from sarkac_spark.streaming.stateful_ingest_dedup import (
    STATE_SCHEMA,
    StatefulDedupPipeline,
    _concat_chunks,
    _seed_members,
    _verify_batch,
)


def tws_available() -> bool:
    """True iff the environment can actually RUN transformWithState
    queries: the API needs the ``google.protobuf`` runtime for its
    Python<->JVM state-server protocol (the import Spark's streaming
    Python runner performs at query planning)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _TwsDedupProcessor(StatefulProcessor):
    """Per-band processor: same packed-binary members value the apply
    engine keeps (``STATE_SCHEMA``), verified/appended through the
    SHARED cores so the two engines cannot drift. ``initialState`` rows
    (the onboarding corpus, banded) install membership via
    ``_seed_members`` — Spark may deliver a key's initial rows in more
    than one chunk, so installation is incremental; a df-capped band
    whose corpus members span chunks may retain a different (equally
    valid) member subset than a single-batch replay would, exactly like
    two replay triggers would."""

    def __init__(
        self,
        id_col: str,
        threshold: float,
        max_band_df: int | None,
        bottom_k: int | None,
        ttl_seconds: int | None,
    ) -> None:
        self.id_col = id_col
        self.threshold = threshold
        self.max_band_df = max_band_df
        self.bottom_k = bottom_k
        self.ttl_seconds = ttl_seconds

    def init(self, handle: StatefulProcessorHandle) -> None:
        ttl_ms = (
            None if self.ttl_seconds is None else int(self.ttl_seconds) * 1000
        )
        self.members = handle.getValueState(
            "members", STATE_SCHEMA, ttlDurationMs=ttl_ms
        )

    def _unpack(self):
        got = self.members.get()
        if got is None:
            return (
                np.empty(0, dtype="<i8"),
                np.empty(0, dtype="<i4"),
                np.empty(0, dtype="<i8"),
            )
        ids_b, lens_b, shs_b = got
        return (
            np.frombuffer(bytes(ids_b or b""), dtype="<i8"),
            np.frombuffer(bytes(lens_b or b""), dtype="<i4"),
            np.frombuffer(bytes(shs_b or b""), dtype="<i8"),
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        ids, lens, shs = self._unpack()
        new_state = _seed_members(
            key[0], initialState, ids, lens, shs, self.id_col, self.max_band_df
        )
        if new_state is not None:
            self.members.update(new_state)

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        ids, lens, shs = self._unpack()
        out, new_state = _verify_batch(
            key[0],
            _concat_chunks(rows),
            ids,
            lens,
            shs,
            self.id_col,
            self.threshold,
            self.max_band_df,
            self.bottom_k,
        )
        if new_state is not None:
            self.members.update(new_state)
        elif self.ttl_seconds is not None and ids.size:
            # sliding-idle parity with the apply engine: a read-only
            # touch (dup dropped, nothing appended) must re-arm the
            # TTL; native value-TTL re-arms only on update, so rewrite
            # the unchanged value (cost bounded by touched bands/batch)
            self.members.update(
                (ids.tobytes(), lens.tobytes(), shs.tobytes())
            )
        yield out

    def close(self) -> None:
        pass


class TwsDedupPipeline(StatefulDedupPipeline):
    """Drop-in twin of ``StatefulDedupPipeline`` (same stores, same
    ``commit_batch``/``compact``/``committed``/``funnel``, same config
    dict) with the stateful operator swapped to
    ``transformWithStateInPandas``. Differences a deployer sees:

    - ``start(..., initial_corpus=...)`` replaces the two-phase
      ``bootstrap_state`` + ``start``: pass the already-deduped corpus
      at FIRST start and Spark installs its band membership during
      batch 0 (``onboard_base_layer`` writes the corpus/quota/funnel
      base stores, the half bootstrap_state did outside the seed).
    - TTL mode allows ``availableNow`` (native value-TTL, no timers).
    - REQUIRES the RocksDB state store provider (a transformWithState
      constraint); ``start`` sets the session conf if unset.
    - REQUIRES a ``google.protobuf`` runtime (``tws_available()``).
    """

    # --- onboarding ------------------------------------------------------

    def onboard_base_layer(self, corpus_df: DataFrame) -> int:
        """Write the corpus/quota/funnel base stores (``epoch=-1``) for
        a corpus that will be passed as ``initial_corpus`` at first
        ``start``. Mirrors the non-seed half of ``bootstrap_state``;
        the band-state half happens inside batch 0 via
        ``initialState``. Returns the corpus row count."""
        n_docs = corpus_df.count()
        self._write_base_layer(corpus_df, n_docs)
        return n_docs

    def _initial_state_grouped(self, corpus_df: DataFrame):
        """Banded (id, sh_set, band_key) projection of the onboarding
        corpus, grouped on the operator's key — what
        ``transformWithStateInPandas`` feeds ``handleInitialState``."""
        return (
            self._banded(corpus_df)
            .select(self.id_col, "sh_set", "band_key")
            .groupBy("band_key")
        )

    # --- the streaming DAG ------------------------------------------------

    def verdict_stream(
        self, doc_stream: DataFrame, initial_corpus: DataFrame | None = None
    ) -> DataFrame:
        mh = self.minhash or {}
        out_schema = StructType(
            list(doc_stream.schema) + [StructField("__dropped", BooleanType())]
        )
        proc = _TwsDedupProcessor(
            self.id_col,
            float(mh.get("threshold", 0.5)),
            mh.get("max_band_df", MINHASH_MAX_BAND_DF),
            mh.get("max_sh_set"),
            self.state_ttl_seconds,
        )
        return self._banded(doc_stream).groupBy(
            "band_key"
        ).transformWithStateInPandas(
            proc,
            outputStructType=out_schema,
            outputMode="append",
            # value-TTL needs a processing-time clock; without TTL no
            # time semantics are used at all
            timeMode=(
                "ProcessingTime" if self.state_ttl_seconds is not None else "None"
            ),
            initialState=(
                None
                if initial_corpus is None
                else self._initial_state_grouped(initial_corpus)
            ),
        )

    def start(
        self,
        doc_stream: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int | None = None,
        initial_corpus: DataFrame | None = None,
    ):
        if not tws_available():
            raise RuntimeError(
                "transformWithStateInPandas needs the google.protobuf "
                "runtime (Spark's streaming Python runner imports it for "
                "the state-server protocol) — absent in this environment. "
                "Use StatefulDedupPipeline (applyInPandasWithState), or "
                "install protobuf."
            )
        # transformWithState requires the RocksDB provider; set it if the
        # session still runs the default HDFS-backed store (runtime SQL
        # conf, read at query start — see session.get_spark docstring)
        provider_key = "spark.sql.streaming.stateStore.providerClass"
        if ROCKSDB_PROVIDER not in (
            self.spark.conf.get(provider_key, "") or ""
        ):
            self.spark.conf.set(provider_key, ROCKSDB_PROVIDER)
        writer = (
            self.verdict_stream(doc_stream, initial_corpus=initial_corpus)
            .writeStream.foreachBatch(self.commit_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        # no timer dance here: native value-TTL keeps availableNow legal
        if trigger_seconds is None:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()

    def bootstrap_state(
        self, corpus_df: DataFrame, checkpoint_dir: str, source_dir: str
    ) -> int:
        raise NotImplementedError(
            "TwsDedupPipeline onboards through initialState, not a seed "
            "trigger: call onboard_base_layer(corpus_df), then "
            "start(stream, ckpt, initial_corpus=corpus_df) on the fresh "
            "checkpoint."
        )

