"""Discovery control plane (reference lib/discovery/Discovery.js).

The reference re-lists topics every 15 s, samples one message per topic
every 30 s, flattens its JSON payload to numeric leaf paths, and — when
the hashed field list changes — merges the discovered fields into the DSL
and re-parses (Discovery.js:38-66,85-173; DSLHandler.js:316-343).

Spark shape: this is driver-side orchestration, not a data-plane
operator. ``DiscoveryLoop.step`` is side-effect-free on the data plane;
when the merged DSL changes it invokes ``on_dsl_change`` — in a live
deployment that callback stops and restarts the streaming query with the
new field set (Spark cannot reconfigure a running query's plan; the
subscribePattern source already picks up *topic* churn without restart,
only *field* changes restart).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from sarkac_spark.config import DSL
from sarkac_spark.operators.discovery import (
    apply_blacklist,
    field_list_hash,
    numeric_leaf_paths_of_json,
    topic_diff,
)


class DiscoveryLoop:
    def __init__(
        self,
        dsl: DSL,
        blacklist: Iterable[str] = (),
        output_topic: str | None = None,
        on_dsl_change: Callable[[DSL], None] | None = None,
        window_config: Callable[[str, str], list[str]] | None = None,
    ) -> None:
        self.dsl = dsl
        self.blacklist = list(blacklist) + ([output_topic] if output_topic else [])
        self.on_dsl_change = on_dsl_change
        self.window_config = window_config  # beforeDiscoveryFieldConfig hook
        self.known_topics: list[str] = sorted(dsl.topics)
        self.field_hashes: dict[str, str] = {}

    def step_topics(self, current_topics: list[str]) -> tuple[list[str], list[str]]:
        """Topic-list scan tick (Discovery.js:85-140): blacklist, diff,
        track. Returns (created, deleted)."""
        current = apply_blacklist(sorted(set(current_topics)), self.blacklist)
        created, deleted = topic_diff(self.known_topics, current)
        self.known_topics = current
        return created, deleted

    def step_fields(self, topic: str, sample_payload: str) -> bool:
        """Field-discovery tick for one sampled message
        (Discovery.js:142-174): flatten, hash, merge on change.
        Returns True when the DSL changed."""
        try:
            parsed = json.loads(sample_payload)
        except (TypeError, ValueError):
            return False
        paths = numeric_leaf_paths_of_json(parsed)
        h = field_list_hash(paths)
        if self.field_hashes.get(topic) == h:
            return False
        self.field_hashes[topic] = h
        new_dsl = self.dsl.merge_discovered({topic: paths}, self.window_config)
        changed = new_dsl.tasks() != self.dsl.tasks()
        self.dsl = new_dsl
        if changed and self.on_dsl_change:
            self.on_dsl_change(new_dsl)
        return changed
