"""TwsDedupPipeline (transformWithStateInPandas engine): the processor
shares ``_verify_batch``/``_seed_members`` with the apply engine, so
verdict parity is pinned by driving BOTH stateful functions over the
same per-band inputs with mock state — that runs in any environment.
End-to-end streaming tests are protobuf-gated (``pytest -m tws``; see
tools/probe_tws.py / PROBE_TWS.json for why this sandbox cannot run
them)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sarkac_spark.streaming.stateful_ingest_dedup import (
    _band_verdicts,
    _pack_state,
    _unpack_state,
)
from sarkac_spark.streaming.tws_ingest_dedup import (
    _TwsDedupProcessor,
    tws_available,
)

MH = {"k": 16, "bands": 8, "threshold": 0.5}


class _FakeGroupState:
    """Just enough of pyspark GroupState for _band_verdicts."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


class _FakeValueState:
    """Just enough of pyspark ValueState for _TwsDedupProcessor."""

    def __init__(self):
        self._v = None
        self.n_updates = 0

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.n_updates += 1

    def clear(self):
        self._v = None


def _mk_proc(ttl=None, **mh_over):
    mh = dict(MH, **mh_over)
    p = _TwsDedupProcessor(
        "doc_id",
        float(mh["threshold"]),
        mh.get("max_band_df", 4),
        mh.get("max_sh_set"),
        ttl,
    )
    p.members = _FakeValueState()
    return p


def _mk_apply(ttl=None, **mh_over):
    mh = dict(MH, **mh_over)
    fn = _band_verdicts(
        "doc_id",
        float(mh["threshold"]),
        mh.get("max_band_df", 4),
        mh.get("max_sh_set"),
        ttl_seconds=ttl,
    )
    return fn, _FakeGroupState()


def _batch(rows):
    """rows: list of (doc_id, sh_set list)."""
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [f"t{r[0]}" for r in rows],
            "sh_set": [np.asarray(r[1], dtype=np.int64) for r in rows],
            "band_key": ["mh|b0"] * len(rows),
        }
    )


# deterministic shingle-hash sets: J(A,B) = 6/10 = 0.6 >= 0.5,
# J(A,C) = 2/14 < 0.5
SET_A = [1, 2, 3, 4, 5, 6, 7, 8]
SET_B = [3, 4, 5, 6, 7, 8, 9, 10]
SET_C = [1, 2, 100, 101, 102, 103, 104, 105]


def _run_both(batches, key=("mh|b0",), ttl=None, **mh_over):
    """Drive the SAME batch sequence through both engines' stateful
    functions; return (verdict frames, final packed state) per engine."""
    proc = _mk_proc(ttl=ttl, **mh_over)
    fn, gstate = _mk_apply(ttl=ttl, **mh_over)
    tws_out, apply_out = [], []
    for rows in batches:
        pdf = _batch(rows)
        tws_out.append(
            pd.concat(proc.handleInputRows(key, iter([pdf.copy()]), None))
        )
        apply_out.append(
            pd.concat(fn(key, iter([pdf.copy()]), gstate))
        )
    return (tws_out, proc.members.get()), (apply_out, gstate.get)


def test_verdict_and_state_parity_across_batches():
    """Same batches, same verdicts, bit-identical packed state — the
    two engines share the verify/append core by construction."""
    batches = [
        [(1, SET_A)],
        [(2, SET_B), (3, SET_C)],  # 2 drops vs 1; 3 admitted
        [(4, SET_B)],              # drops vs seen 2 (seen-corpus)
    ]
    (t_out, t_state), (a_out, a_state) = _run_both(batches)
    for t, a in zip(t_out, a_out):
        pd.testing.assert_frame_equal(
            t.reset_index(drop=True), a.reset_index(drop=True)
        )
    assert t_state == a_state  # packed bytes equal
    assert [list(x["__dropped"]) for x in t_out] == [
        [False],
        [True, False],
        [True],
    ]


def test_exact_band_parity():
    batches = [[(1, [])], [(2, [])], [(3, [])]]
    (t_out, t_state), (a_out, a_state) = _run_both(
        batches, key=("xh|deadbeef",)
    )
    for t, a in zip(t_out, a_out):
        pd.testing.assert_frame_equal(
            t.reset_index(drop=True), a.reset_index(drop=True)
        )
    assert t_state == a_state
    # presence semantics: first admitted, replays dropped, state stays
    # one member
    assert [list(x["__dropped"]) for x in t_out] == [[False], [True], [True]]
    ids = np.frombuffer(t_state[0], dtype="<i8")
    assert ids.tolist() == [1]


def test_hot_band_cap_parity():
    """At max_band_df the band stops matching AND stops growing — both
    engines, same packed state."""
    batches = [[(1, SET_A)], [(2, SET_C)], [(3, SET_B)], [(4, SET_A)]]
    (t_out, t_state), (a_out, a_state) = _run_both(batches, max_band_df=2)
    assert t_state == a_state
    # band hot after 2 members: docs 3 and 4 are NOT matched (admitted)
    assert [list(x["__dropped"]) for x in t_out] == [
        [False],
        [False],
        [False],
        [False],
    ]
    assert np.frombuffer(t_state[0], dtype="<i8").tolist() == [1, 2]
    for t, a in zip(t_out, a_out):
        pd.testing.assert_frame_equal(
            t.reset_index(drop=True), a.reset_index(drop=True)
        )


def test_bottom_k_estimator_parity():
    (t_out, t_state), (a_out, a_state) = _run_both(
        [[(1, SET_A)], [(2, SET_B)]], max_sh_set=6
    )
    assert t_state == a_state
    for t, a in zip(t_out, a_out):
        pd.testing.assert_frame_equal(
            t.reset_index(drop=True), a.reset_index(drop=True)
        )


def test_initial_state_matches_seed_then_verify():
    """handleInitialState installs the same membership the apply
    engine's _seed_state would, and a post-onboard dup is dropped."""
    from sarkac_spark.streaming.stateful_ingest_dedup import _seed_state

    init_pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "sh_set": [
                np.asarray(SET_A, dtype=np.int64),
                np.asarray(SET_C, dtype=np.int64),
            ],
        }
    )
    proc = _mk_proc()
    proc.handleInitialState(("mh|b0",), init_pdf, None)

    seed_fn = _seed_state("doc_id", 4)
    gstate = _FakeGroupState()
    seed_pdf = init_pdf.copy()
    seed_pdf["band_key"] = "mh|b0"
    list(seed_fn(("mh|b0",), iter([seed_pdf]), gstate))
    assert proc.members.get() == gstate.get

    out = pd.concat(
        proc.handleInputRows(("mh|b0",), iter([_batch([(3, SET_B)])]), None)
    )
    assert list(out["__dropped"]) == [True]  # dups onboarded doc 1


def test_initial_state_chunked_install_respects_cap():
    """Spark may deliver a key's initial rows in several chunks; the
    incremental install keeps the df cap as an upper bound."""
    proc = _mk_proc(max_band_df=3)
    for lo in (0, 2, 4):
        chunk = pd.DataFrame(
            {
                "doc_id": [lo + 1, lo + 2],
                "sh_set": [
                    np.asarray(SET_A, dtype=np.int64),
                    np.asarray(SET_B, dtype=np.int64),
                ],
            }
        )
        proc.handleInitialState(("mh|b0",), chunk, None)
    ids = np.frombuffer(proc.members.get()[0], dtype="<i8")
    assert ids.tolist() == [1, 2, 3]  # capped at 3, id-ordered per chunk


def test_ttl_read_touch_rewrites_value():
    """Sliding-idle parity: in TTL mode a READ-ONLY touch (exact-band
    replay — dropped with no state append, since an exact band keeps
    only its first member) rewrites the unchanged value so native
    value-TTL re-arms; without TTL no redundant write happens. (A
    near-dup drop is NOT read-only — seen-corpus semantics append the
    dropped doc too.)"""
    key = ("xh|deadbeef",)
    for ttl, extra_updates in ((None, 0), (60, 1)):
        proc = _mk_proc(ttl=ttl)
        pd.concat(proc.handleInputRows(key, iter([_batch([(1, [])])]), None))
        n0 = proc.members.n_updates
        before = proc.members.get()
        out = pd.concat(
            proc.handleInputRows(key, iter([_batch([(2, [])])]), None)
        )
        assert list(out["__dropped"]) == [True]
        assert proc.members.get() == before  # value unchanged either way
        assert proc.members.n_updates - n0 == extra_updates


def test_expired_value_readmits():
    """Native TTL expiry = get() returns None = fresh band: the next
    duplicate is re-admitted (the eviction contract, value-level)."""
    proc = _mk_proc(ttl=60)
    pd.concat(
        proc.handleInputRows(("mh|b0",), iter([_batch([(1, SET_A)])]), None)
    )
    proc.members._v = None  # what an expired value-state read returns
    out = pd.concat(
        proc.handleInputRows(("mh|b0",), iter([_batch([(2, SET_A)])]), None)
    )
    assert list(out["__dropped"]) == [False]


def test_unpack_roundtrip_matches_parent_packing():
    """The processor's _unpack reads exactly what the shared _pack_state
    writes (and what the apply engine's _unpack_state reads)."""
    packed = _pack_state([1, 2], [3, 0], [10, 20, 30])
    proc = _mk_proc()
    proc.members.update(packed)
    ids, lens, shs = proc._unpack()
    assert ids.tolist() == [1, 2]
    assert lens.tolist() == [3, 0]
    assert shs.tolist() == [10, 20, 30]

    class _S:
        exists = True
        get = packed

    a_ids, a_lens, a_shs = _unpack_state(_S())
    assert (
        a_ids.tolist() == ids.tolist()
        and a_lens.tolist() == lens.tolist()
        and a_shs.tolist() == shs.tolist()
    )


def test_engine_unavailable_raises_actionable_error(spark, tmp_path):
    """Without a protobuf runtime, start() refuses with the remediation
    (this sandbox's recorded state — see PROBE_TWS.json)."""
    from sarkac_spark.streaming.tws_ingest_dedup import TwsDedupPipeline

    if tws_available():
        pytest.skip("protobuf present: covered by the -m tws e2e tests")
    pipe = TwsDedupPipeline(
        spark, str(tmp_path / "store"), minhash=dict(MH)
    )
    stream = spark.readStream.schema(
        "doc_id long, text string, source string"
    ).parquet(str(tmp_path / "src_none") + "/*")
    with pytest.raises(RuntimeError, match="google.protobuf"):
        pipe.start(stream, str(tmp_path / "ckpt"))
    with pytest.raises(NotImplementedError, match="initialState"):
        pipe.bootstrap_state(None, "", "")


@pytest.mark.tws
@pytest.mark.skipif(not tws_available(), reason="no google.protobuf runtime")
def test_tws_end_to_end_parity(spark, tmp_path):
    """Protobuf-gated: full streaming parity vs StatefulDedupPipeline —
    same committed set, same funnel — plus initialState onboarding and
    an availableNow drain in TTL mode (legal here, forbidden in the
    apply engine)."""
    from pyspark.sql import functions as F

    from sarkac_spark.streaming.stateful_ingest_dedup import (
        StatefulDedupPipeline,
    )
    from sarkac_spark.streaming.tws_ingest_dedup import TwsDedupPipeline

    SCHEMA = "doc_id long, text string, source string"
    T1 = "the quick brown fox and the lazy dog ran over twelve quiet hills"
    T2 = "spark shuffles the data between stages and it regroups all the rows"
    T2N = "spark shuffles the data between stages and it regroups all the row"
    T3 = "broadcast joins avoid the shuffle when one side fits in memory"
    epochs = [
        [(1, T1, "web"), (2, T2, "web")],
        [(3, T2N, "news"), (4, T3, "blog"), (5, T1, "web")],
    ]

    def _drive(pipe_cls, tag, **kw):
        src = tmp_path / f"src_{tag}"
        src.mkdir()
        for i, rows in enumerate(epochs):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
                str(src / f"b{i:03d}")
            )
        pipe = pipe_cls(
            spark, str(tmp_path / f"store_{tag}"), minhash=dict(MH), **kw
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = pipe.start(stream, str(tmp_path / f"ckpt_{tag}"))
        q.awaitTermination(300)
        return pipe

    ref = _drive(StatefulDedupPipeline, "apply")
    tws = _drive(TwsDedupPipeline, "tws")
    want = {r.doc_id for r in ref.committed().collect()}
    got = {r.doc_id for r in tws.committed().collect()}
    assert got == want
    assert {
        (r.epoch, r.stage, r.n_docs) for r in tws.funnel().collect()
    } == {(r.epoch, r.stage, r.n_docs) for r in ref.funnel().collect()}

    # initialState onboarding: dup of an onboarded doc dropped
    corpus = spark.createDataFrame([(1, T1, "web")], SCHEMA)
    pipe2 = TwsDedupPipeline(
        spark, str(tmp_path / "store_init"), minhash=dict(MH)
    )
    pipe2.onboard_base_layer(corpus)
    src2 = tmp_path / "src_init"
    src2.mkdir()
    spark.createDataFrame([(6, T1, "web"), (7, T3, "web")], SCHEMA).coalesce(
        1
    ).write.parquet(str(src2 / "b000"))
    stream2 = spark.readStream.schema(SCHEMA).parquet(str(src2 / "*"))
    q = pipe2.start(
        stream2, str(tmp_path / "ckpt_init"), initial_corpus=corpus
    )
    q.awaitTermination(300)
    assert {r.doc_id for r in pipe2.committed().collect()} == {1, 7}

    # TTL mode: availableNow drain terminates (the lifted restriction)
    pipe3 = TwsDedupPipeline(
        spark,
        str(tmp_path / "store_ttl"),
        minhash=dict(MH),
        state_ttl_seconds=3600,
    )
    src3 = tmp_path / "src_ttl"
    src3.mkdir()
    spark.createDataFrame([(8, T2, "web")], SCHEMA).coalesce(1).write.parquet(
        str(src3 / "b000")
    )
    stream3 = spark.readStream.schema(SCHEMA).parquet(str(src3 / "*"))
    q = pipe3.start(stream3, str(tmp_path / "ckpt_ttl3"))
    assert q.awaitTermination(300)
    assert {r.doc_id for r in pipe3.committed().collect()} == {8}
    assert F is not None
