"""Pure-logic tests for the bench.py fault-tolerance harness (no backend).

The bench itself needs the TPU; these gate the parent-process machinery:
partial-result recovery and the warm/cold attempt-timeout selection.
"""

import importlib.util
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


class TestBestJsonLine:
    def test_none_input(self):
        assert bench._best_json_line(None) is None
        assert bench._best_json_line(b"") is None

    def test_no_json(self):
        assert bench._best_json_line(b"warming up\ncompiling\n") is None

    def test_final_line_wins(self):
        partial = json.dumps({"metric": "march", "partial": True})
        final = json.dumps({"metric": "full", "value": 50.0})
        raw = f"noise\n{partial}\n{final}\n".encode()
        assert bench._best_json_line(raw) == final

    def test_partial_survives_truncated_tail(self):
        partial = json.dumps({"metric": "march", "partial": True})
        raw = f"{partial}\n{{\"metric\": \"full\", \"val".encode()
        assert bench._best_json_line(raw) == partial

    def test_undecodable_bytes_do_not_raise(self):
        partial = json.dumps({"metric": "march", "partial": True})
        raw = partial.encode() + b"\n\xff\xfe broken"
        assert bench._best_json_line(raw) == partial


class TestTimeoutEscalation:
    """A child timeout must escalate later attempts to the cold budget:
    killing an in-progress cold compile at the warm deadline and
    restarting it from scratch livelocks (observed live in r5 — the
    full-pipeline compile outlived every 600 s warm window)."""

    def test_escalates_after_timeout(self, monkeypatch):
        import subprocess

        seen = []

        def fake_run(cmd, **kw):
            if "-c" in cmd:  # liveness probe child
                return type("P", (), {"returncode": 0})()
            seen.append(kw["timeout"])
            raise subprocess.TimeoutExpired(cmd, kw["timeout"])

        # bench imports subprocess lazily inside main(): patch the module
        monkeypatch.setattr(subprocess, "run", fake_run)
        monkeypatch.setattr(bench, "_attempt_timeout",
                            lambda: bench.ATTEMPT_TIMEOUT_WARM_S)
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        monkeypatch.setattr(bench, "ATTEMPTS", 4)
        try:
            bench.main()
            raised = False
        except SystemExit as e:
            raised = bool(e.code)
        assert raised
        assert seen[0] == bench.ATTEMPT_TIMEOUT_WARM_S
        # every post-timeout attempt runs with the cold budget, and the
        # 3-timeout circuit breaker stops before ATTEMPTS is exhausted
        assert seen[1:] == [bench.ATTEMPT_TIMEOUT_COLD_S] * 2


class TestAttemptTimeout:
    def test_warm_le_cold(self):
        assert bench.ATTEMPT_TIMEOUT_WARM_S <= bench.ATTEMPT_TIMEOUT_COLD_S
        # VERDICT r2 #2: warm-path attempt timeout must be <= 600 s so two
        # hangs abort inside the driver's window.
        assert bench.ATTEMPT_TIMEOUT_WARM_S <= 600

    def test_selects_by_cache_state(self, tmp_path, monkeypatch):
        import time

        monkeypatch.setattr(bench, "HERE", str(tmp_path))
        assert bench._attempt_timeout() == bench.ATTEMPT_TIMEOUT_COLD_S
        (tmp_path / "stars.grid.npz").write_bytes(b"x")
        cache = tmp_path / ".jax_cache"
        cache.mkdir()
        assert bench._attempt_timeout() == bench.ATTEMPT_TIMEOUT_COLD_S  # empty cache
        entry = cache / "entry"
        entry.write_bytes(b"x")
        # Cache entry newer than every source file -> warm.
        future = time.time() + 3600
        os.utime(entry, (future, future))
        assert bench._attempt_timeout() == bench.ATTEMPT_TIMEOUT_WARM_S
        # Stale cache (older than the sources) -> a code change means a
        # full recompile: cold budget.
        os.utime(entry, (1.0, 1.0))
        assert bench._attempt_timeout() == bench.ATTEMPT_TIMEOUT_COLD_S
