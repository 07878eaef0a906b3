"""Duration parsing (reference DSLHandler.js:79-87 via juration) and DSL
model tests — vectors from FIXTURES.md F5."""

import pytest

from sarkac_spark.config import (
    DSL,
    FieldSpec,
    humanize_duration,
    parse_duration,
)


@pytest.mark.parametrize(
    ("text", "seconds"),
    [
        ("30s", 30),
        ("1m", 60),
        ("3m", 180),
        ("5m", 300),
        ("15m", 900),
        ("1h", 3600),
        ("12h", 43200),
        ("2d", 172800),
        ("1w", 604800),
        ("1.5h", 5400),
        (900, 900),
    ],
)
def test_parse_duration(text, seconds):
    assert parse_duration(text) == seconds


@pytest.mark.parametrize("bad", ["", "abc", "12", "5 parsecs"])
def test_parse_duration_rejects(bad):
    with pytest.raises(ValueError):
        parse_duration(bad)


@pytest.mark.parametrize(
    ("text", "seconds"),
    [
        ("1h30m", 5400),             # compound, no separators
        ("1 hr 20 mins", 4800),      # synonym units with spaces
        ("2 days, 4 hours", 187200), # comma separator
        ("1m and 30s", 90),          # "and" separator
        ("1H30M", 5400),             # case-insensitive
        ("  15m  ", 900),            # surrounding whitespace
        ("1mo", 2628000),            # juration month = year/12
        ("2yrs", 63072000),          # juration year = 365d
        ("500ms", 0),                # sub-second floors to 0
        ("1s500ms", 1),              # ms participates in compounds
    ],
)
def test_parse_duration_juration_grammar(text, seconds):
    """Compound-string parity with juration (the reference's parser,
    DSLHandler.js:79-87): number-unit pairs sum, any published synonym
    works, case and separators are free."""
    assert parse_duration(text) == seconds


# --- hypothesis: the parser vs juration's grammar, property-style --------

from hypothesis import assume, given, settings, strategies as st  # noqa: E402

from sarkac_spark.config import _UNIT_SECONDS  # noqa: E402

_WHOLE_UNITS = sorted(u for u in _UNIT_SECONDS if u != "ms")


@st.composite
def _compound_duration(draw):
    pairs = draw(
        st.lists(
            st.tuples(st.integers(0, 999), st.sampled_from(_WHOLE_UNITS)),
            min_size=1,
            max_size=4,
        )
    )
    text, total = "", 0
    for qty, unit in pairs:
        shown = unit.upper() if draw(st.booleans()) else unit
        text += (
            draw(st.sampled_from(["", " "]))
            + str(qty)
            + draw(st.sampled_from(["", " ", "  "]))
            + shown
            + draw(st.sampled_from(["", " ", ", ", " and "]))
        )
        total += qty * _UNIT_SECONDS[unit]
    return text, total


@settings(max_examples=200, deadline=None)
@given(_compound_duration())
def test_compound_durations_sum(case):
    text, total = case
    assert parse_duration(text) == total


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 99), st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8))
def test_unknown_units_always_raise(qty, unit):
    assume(unit not in _UNIT_SECONDS)
    with pytest.raises(ValueError):
        parse_duration(f"{qty}{unit}")


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 10**7))
def test_humanize_parse_roundtrip(seconds):
    assert parse_duration(humanize_duration(seconds)) == seconds


@pytest.mark.parametrize(
    ("seconds", "text"),
    [(30, "30s"), (900, "15m"), (3600, "1h"), (43200, "12h"), (86400, "1d"), (604800, "1w"), (90, "90s")],
)
def test_humanize(seconds, text):
    assert humanize_duration(seconds) == text


def test_dsl_parse_fixture():
    # example/example.js:26-39 shape
    dsl = DSL.parse(
        {
            "test-topic": {
                "fields": {
                    "sub.one": {"windows": ["1m", "bogus"]},
                    "two": {"windows": ["3m", "1h"]},
                }
            }
        }
    )
    spec = dsl.topics["test-topic"]
    by_path = {f.path: f for f in spec.fields}
    assert by_path["sub.one"].windows == (60,)  # invalid window dropped
    assert by_path["two"].windows == (180, 3600)
    assert by_path["two"].retention_seconds == 3600
    assert dsl.kafka_topics() == ["test-topic"]
    assert ("test-topic", "two", 180) in dsl.tasks()


def test_dsl_defaults_when_all_windows_invalid():
    dsl = DSL.parse({"t": {"fields": {"x": {"windows": ["nope"]}}}})
    assert dsl.topics["t"].fields[0].windows == (900,)  # DEFAULT_FIELD_WINDOWS


def test_merge_discovered_fixed_config_wins():
    base = DSL.parse({"t": {"fields": {"a": {"windows": ["1m"]}}}})
    merged = base.merge_discovered({"t": ["a", "b"], "u": ["c"]})
    t_fields = {f.path: f for f in merged.topics["t"].fields}
    assert t_fields["a"].windows == (60,)  # fixed config kept
    assert t_fields["b"].windows == (900,)  # discovered gets default
    assert merged.topics["u"].fields == (FieldSpec("c", (900,)),)


def test_stateful_stream_sizing_smoke():
    """The ARCHITECTURE.md sizing math: state = series x rate x retention,
    partitions track series count, RocksDB provider always present."""
    from sarkac_spark.session import stateful_stream_sizing

    # 10k series at 1 Hz with 15 min retention ~ 9M retained points
    s = stateful_stream_sizing(
        n_series=10_000, rate_hz_per_series=1.0,
        retention_seconds=900, executors=50,
    )
    assert s["points_per_series"] == 900
    assert s["state_rows"] == 9_000_000
    assert s["state_bytes"] == 9_000_000 * 48
    parts = int(s["conf"]["spark.sql.shuffle.partitions"])
    # enough to spread 10k series (>= executors), never more than series
    assert 50 <= parts <= 10_000
    assert "RocksDBStateStoreProvider" in s["conf"][
        "spark.sql.streaming.stateStore.providerClass"
    ]

    # tiny deployment: partitions collapse toward the series count,
    # never paying empty store commits
    t = stateful_stream_sizing(
        n_series=2, rate_hz_per_series=5.0, retention_seconds=60,
    )
    assert int(t["conf"]["spark.sql.shuffle.partitions"]) <= 2
    assert t["state_rows"] == 600
