"""bench.py's wedge probe: pass path and fail-fast path.

The remote-TPU tunnel's known failure mode is every op hanging forever
(CLAUDE.md environment quirks); bench.py probes with a tiny op on a daemon
thread and emits a one-line JSON error instead of hanging the driver."""

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import bench


def test_probe_passes_on_live_backend():
    # conftest forces the CPU backend; a live backend must not exit.
    bench._probe_device(timeout_s=120.0)


def test_probe_emits_json_error_and_exits_on_wedge(monkeypatch):
    import threading

    calls = []
    monkeypatch.setattr(os, "_exit", lambda code: calls.append(code))
    never = threading.Event()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        # A deterministic wedge: the probe op blocks until we release it.
        bench._probe_device(timeout_s=0.05, _op=lambda: never.wait(30.0))
    line = buf.getvalue().strip()
    out = json.loads(line)
    assert out["metric"] == "train_rays_per_sec_per_chip"
    assert out["value"] is None
    assert "TPU unreachable" in out["error"]
    assert calls == [1]
    never.set()  # release the stand-in op so no thread lingers
