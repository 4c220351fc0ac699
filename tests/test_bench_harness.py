"""bench.py orchestrator invariants (no Spark session needed)."""

from __future__ import annotations

import subprocess

import bench


def test_families_partition_headline() -> None:
    names = [n for fam in bench.FAMILIES.values() for n in fam]
    assert len(names) == len(set(names))
    assert bench.HEADLINE == names


def test_every_headline_query_is_registered() -> None:
    from crawlingbigdatavisionaid_spark.plans import query_map

    missing = [q for q in bench.HEADLINE if q not in query_map()]
    assert not missing, missing


def test_spawn_survives_a_hung_family(monkeypatch) -> None:
    """r8 self-review: a family JVM hanging past the timeout must come
    back as an error RECORD (the bench always emits its summary), not
    an uncaught TimeoutExpired that loses every measured family. r9:
    _spawn moved to Popen + start_new_session so the whole process
    GROUP (the Spark JVM grandchild included) is SIGKILLed on timeout —
    the fake asserts the group kill is attempted on the child's pid."""
    killed: list[tuple[int, int]] = []

    class FakeProc:
        pid = 4242

        def communicate(self, timeout=None):
            raise subprocess.TimeoutExpired(cmd="x", timeout=3600)

        def wait(self):
            return 0

    monkeypatch.setattr(subprocess, "Popen", lambda *a, **k: FakeProc())
    monkeypatch.setattr(
        bench.os, "killpg", lambda pgid, sig: killed.append((pgid, sig))
    )
    got = bench._spawn("dedup", "/nonexistent", "8g")
    assert "_error" in got and "3600" in got["_error"]
    assert got["_family_wall_s"] >= 0
    assert killed == [(4242, bench.signal.SIGKILL)]
