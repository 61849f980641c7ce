"""Skipped-by-default real-broker Kafka smoke (SURVEY.md §2.1 O1/O2/O22).

The sandbox has no broker (``/root/reference/docker-setup/docker-compose.yml``
provides one in the reference's deployment), so the default gate for the
Kafka endpoints is the file-twin harness.  When an environment exports
``KAFKA_BOOTSTRAP``, this test runs ``tools/kafka_smoke.py`` in a fresh
subprocess (the connector jar must be on the session classpath at JVM
start, so it cannot reuse the shared test session) and asserts the
O1 -> O22 round-trip passes.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="no Kafka broker: set KAFKA_BOOTSTRAP=host:port to enable",
)
def test_kafka_o1_to_o22_roundtrip():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "kafka_smoke.py")],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    assert "KAFKA SMOKE PASS" in proc.stdout


def test_kafka_smoke_importable_and_refuses_without_env(monkeypatch):
    """The tool itself must stay import-clean in broker-less environments."""
    monkeypatch.delenv("KAFKA_BOOTSTRAP", raising=False)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import kafka_smoke
    finally:
        sys.path.pop(0)
    assert kafka_smoke.main() == 2
