"""Smoke-run the examples: they are the user-facing lifecycle docs, so
CI proves they keep working (VERDICT round 3, item 8 — the end-to-end
discovery/stateful/restart demo must run in smoke mode)."""

from __future__ import annotations

import pytest

# e2e tier: real streaming queries / subprocess sessions — minutes each.
# Excluded from the default (driver-verify) fast run; the builder's
# once-per-round full run includes them (pytest -m "slow or not slow").
pytestmark = pytest.mark.slow


import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_streaming_demo_smoke():
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "streaming_demo.py")],
        capture_output=True,
        text=True,
        timeout=290,
        cwd=REPO,
        check=False,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "restart happened: True" in out.stdout
    assert "OK: " in out.stdout


def test_batch_curation_job_smoke():
    """The batch-side lifecycle doc (VERDICT round 4, item 5): JSONL
    crawl with planted corrupt lines -> read_jsonl audit -> Curator
    funnel -> size-capped write. The script asserts corrupt count,
    funnel consistency, file sizing, and dup elimination internally."""
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "batch_curation_job.py")],
        capture_output=True,
        text=True,
        timeout=290,
        cwd=REPO,
        check=False,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "2 corrupt" in out.stdout
    assert "OK: batch curation job complete" in out.stdout


def test_streaming_curation_job_smoke():
    """The ingest-time curation lifecycle doc (round 8): stream drops
    through StreamingCuratorPipeline with a restart, funnel audit,
    quota check, store compaction, the keyed-state engine act, and
    (round 11) the bulk-backfill + streamed-increment act."""
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "streaming_curation_job.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        check=False,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "OK: " in out.stdout
    assert "funnel:" in out.stdout
    assert "OK: backfill committed" in out.stdout


def test_span_dedup_job_smoke():
    """The exact-substring dedup lifecycle doc (round 12): evidence
    pass, removal with byte-identical pass-through, fixed-point
    iteration, and paragraph-boundary units — each stop asserts its
    invariant internally."""
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "span_dedup_job.py")],
        capture_output=True,
        text=True,
        timeout=400,
        cwd=REPO,
        check=False,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "OK: evidence pass localized 2 spans" in out.stdout
    assert "OK: fixed point reached" in out.stdout
    assert "OK: paragraph mode dropped" in out.stdout


def test_analytics_job_smoke():
    """The analytics lifecycle doc (late round 8): bloom-gated join ==
    plain join, distributed top-10, batch sessionize, and the
    streaming session_window twin with a verified cross-trigger
    merge."""
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "analytics_job.py")],
        capture_output=True,
        text=True,
        timeout=400,
        cwd=REPO,
        check=False,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "OK: bloom-gated join == plain join" in out.stdout
    assert "cross-trigger merge verified" in out.stdout
