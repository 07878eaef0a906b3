"""The sarkac DSL: topic -> field path -> window list.

The reference parses a config object of shape
``dsl[topic].fields[path].windows = ["1m", "3m", ...]`` into an IR
``parsed[topic] = [{path, windows(seconds), retentionSeconds}]`` — that IR
is its entire "logical plan" (reference lib/dsl/DSLHandler.js:38-97).
Here the same model is typed dataclasses; window parsing mirrors the
juration semantics the reference relies on (DSLHandler.js:79-87) and
retention = max(windows) per field (DSLHandler.js:91).

Defaults mirror the reference: DEFAULT_FIELD_WINDOWS = ["15m"]
(DSLHandler.js:12), DEFAULT_FREQ_WINDOWS = ["15m", "12h", "1d"]
(DSLHandler.js:15), anomaly scan every 15 s (Sarkac.js:12), min 3 events
for stats (DSLHandler.js:243-244), 2-minute anomaly re-emit cooldown
(DSLHandler.js:13).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# --- duration parsing (juration-equivalent subset) ----------------------

_UNIT_SECONDS: dict[str, int] = {
    "ms": 0,  # handled specially (fractional seconds round down)
    "s": 1,
    "sec": 1,
    "secs": 1,
    "second": 1,
    "seconds": 1,
    "m": 60,
    "min": 60,
    "mins": 60,
    "minute": 60,
    "minutes": 60,
    "h": 3600,
    "hr": 3600,
    "hrs": 3600,
    "hour": 3600,
    "hours": 3600,
    "d": 86400,
    "day": 86400,
    "days": 86400,
    "w": 604800,
    "week": 604800,
    "weeks": 604800,
}

# juration (the reference's parser, DSLHandler.js:79-87) also knows
# months and years; published juration 0.1.x values
_UNIT_SECONDS.update(
    {
        "mo": 2628000,
        "mos": 2628000,
        "mon": 2628000,
        "mons": 2628000,
        "mth": 2628000,
        "mths": 2628000,
        "month": 2628000,
        "months": 2628000,
        "y": 31536000,
        "yr": 31536000,
        "yrs": 31536000,
        "year": 31536000,
        "years": 31536000,
    }
)

# one number-unit pair; juration sums every pair in the string
# ("1h30m", "1 hr 20 mins", "2 days, 4 hours")
_DURATION_PART_RE = re.compile(r"(\d+(?:\.\d+)?)\s*([a-zA-Z]+)")
# what may remain between/around pairs: whitespace, commas, "and"
_DURATION_FILLER_RE = re.compile(r"^(?:[\s,]|and\b)*$", re.IGNORECASE)

# canonical largest-unit-first order for humanize
_HUMAN_UNITS: list[tuple[str, int]] = [
    ("w", 604800),
    ("d", 86400),
    ("h", 3600),
    ("m", 60),
    ("s", 1),
]


def parse_duration(text: str | int | float) -> int:
    """``"15m"`` -> 900 seconds; compound strings sum like juration
    (``"1h30m"`` -> 5400, ``"2 days, 4 hrs"`` -> 187200), units are
    case-insensitive with the published juration synonym set (s/sec/…,
    m/min/…, h/hr/…, d/day/…, w/wk/…, mo/mth/…, y/yr/…). Numbers pass
    through as seconds.

    Raises ValueError on unparseable input — the reference drops invalid
    windows with a debug log (DSLHandler.js:69-87); callers that want that
    behavior catch the error.
    """
    if isinstance(text, (int, float)):
        return int(text)
    parts = list(_DURATION_PART_RE.finditer(text))
    if not parts:
        raise ValueError(f"unparseable duration: {text!r}")
    residue = _DURATION_PART_RE.sub("", text)
    if not _DURATION_FILLER_RE.match(residue):
        raise ValueError(f"unparseable duration: {text!r}")
    total = 0.0
    for m in parts:
        qty, unit = float(m.group(1)), m.group(2).lower()
        if unit == "ms":
            total += qty / 1000.0
            continue
        if unit not in _UNIT_SECONDS:
            raise ValueError(f"unknown duration unit: {unit!r} in {text!r}")
        total += qty * _UNIT_SECONDS[unit]
    return int(total)


def humanize_duration(seconds: int) -> str:
    """900 -> ``"15m"`` — the anomaly record's ``humanWindow``
    (reference DSLHandler.js:221). Largest exact single unit wins;
    non-exact values fall back to ``"{n}s"``."""
    for suffix, size in _HUMAN_UNITS:
        if seconds >= size and seconds % size == 0:
            return f"{seconds // size}{suffix}"
    return f"{seconds}s"


# --- DSL model -----------------------------------------------------------

DEFAULT_FIELD_WINDOWS: tuple[str, ...] = ("15m",)
DEFAULT_FREQ_WINDOWS: tuple[str, ...] = ("15m", "12h", "1d")
DEFAULT_ANOMALY_SCAN_SECONDS = 15
MIN_EVENTS_FOR_STATS = 3
ANOMALY_COOLDOWN_SECONDS = 120
TOPIC_FREQUENCY_FIELD = "__topic_frequency"


@dataclass(frozen=True)
class FieldSpec:
    """One tracked field: dotted path + trailing windows (seconds)."""

    path: str
    windows: tuple[int, ...]

    @property
    def retention_seconds(self) -> int:
        # retention = max window (reference DSLHandler.js:91)
        return max(self.windows)


@dataclass(frozen=True)
class TopicSpec:
    topic: str
    fields: tuple[FieldSpec, ...]


@dataclass
class DSL:
    """Parsed DSL — the logical-plan input for the engine."""

    topics: dict[str, TopicSpec] = field(default_factory=dict)

    @classmethod
    def parse(cls, raw: dict) -> "DSL":
        """``{"topic": {"fields": {"a.b": {"windows": ["1m"]}}}}`` -> DSL.

        Invalid windows are dropped (not fatal) to match the reference
        (DSLHandler.js:69-87); a field whose windows all fail gets the
        default window list.
        """
        topics: dict[str, TopicSpec] = {}
        for topic, tcfg in raw.items():
            fields: list[FieldSpec] = []
            for path, fcfg in (tcfg.get("fields") or {}).items():
                wins: list[int] = []
                for w in fcfg.get("windows") or DEFAULT_FIELD_WINDOWS:
                    try:
                        parsed = parse_duration(w)
                    except ValueError:
                        continue
                    if parsed > 0:
                        wins.append(parsed)
                if not wins:
                    wins = [parse_duration(w) for w in DEFAULT_FIELD_WINDOWS]
                fields.append(FieldSpec(path=path, windows=tuple(sorted(set(wins)))))
            topics[topic] = TopicSpec(topic=topic, fields=tuple(fields))
        return cls(topics=topics)

    def kafka_topics(self) -> list[str]:
        return sorted(self.topics)

    def tasks(self) -> list[tuple[str, str, int]]:
        """The (topic, path, window) cross product — the reference builds
        this as its periodic scan task list (DSLHandler.js:272-291); here
        it parameterizes one grouped aggregation instead."""
        return [
            (t.topic, f.path, w)
            for t in self.topics.values()
            for f in t.fields
            for w in f.windows
        ]

    def merge_discovered(self, discovered: dict[str, list[str]], window_config=None) -> "DSL":
        """Merge discovered topic->field-paths into this DSL; explicitly
        configured fields win (reference DSLHandler.js:316-343). Optional
        ``window_config(topic, path) -> list[str]`` hook mirrors
        ``beforeDiscoveryFieldConfig`` (DSLHandler.js:345-369)."""
        merged = dict(self.topics)
        for topic, paths in discovered.items():
            existing = merged.get(topic)
            known = {f.path for f in existing.fields} if existing else set()
            new_fields = list(existing.fields) if existing else []
            for path in paths:
                if path in known:
                    continue  # fixed config always overrides discovery
                wins = DEFAULT_FIELD_WINDOWS
                if window_config is not None:
                    wins = tuple(window_config(topic, path) or DEFAULT_FIELD_WINDOWS)
                parsed = tuple(sorted({parse_duration(w) for w in wins}))
                new_fields.append(FieldSpec(path=path, windows=parsed))
            merged[topic] = TopicSpec(topic=topic, fields=tuple(new_fields))
        return DSL(topics=merged)
