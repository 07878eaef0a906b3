"""HTTP observability wrapper (S9) — route parity with the reference
lib/HttpServer.js."""

from __future__ import annotations

import json
import urllib.request

from sarkac_spark.sarkac import Sarkac
from sarkac_spark.streaming.http_server import serve


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        body = r.read().decode()
        return r.status, body


def test_http_routes(spark, tmp_path):
    sarkac = Sarkac(
        spark,
        {"dsl": {"t": {"fields": {"a.b": {"windows": ["1m"]}}}}},
        work_dir=str(tmp_path),
    )
    server = serve(sarkac, port=18733)
    try:
        status, body = _get(18733, "/")
        assert status == 200 and json.loads(body)["name"] == "sarkac_spark"

        status, body = _get(18733, "/healthcheck")
        assert status == 200 and body == "OK"

        status, body = _get(18733, "/dsl")
        assert json.loads(body) == {"t": {"a.b": {"windows": [60]}}}

        status, body = _get(18733, "/dsl/topics")
        assert json.loads(body) == ["t"]

        status, body = _get(18733, "/status")
        assert "stats" in json.loads(body)

        status, body = _get(18733, "/discovery/topics")
        assert json.loads(body) == ["t"]

        try:
            _get(18733, "/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
