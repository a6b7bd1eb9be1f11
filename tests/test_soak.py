"""Short-run smoke of the elastic-serving soak harness (tools/soak.py).

The real soak is minutes-to-hours (recorded runs in SOAK_REPORT.json /
working notes); this keeps the harness itself — churn, reader deaths,
identity verifier, report schema — exercised in-suite.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("extra", [[], ["--sigterm", "--duration", "30"]])
def test_soak_smoke(tmp_path, extra):
    report = tmp_path / "report.json"
    args = [sys.executable, os.path.join(REPO, "tools", "soak.py"),
            "--ticks", "60", "--churn-every", "15", "--check-every", "20",
            "--report", str(report)]
    if extra:
        args += extra
    else:
        args += ["--duration", "0"]
    env = dict(os.environ, BACKSCRUB_TPU_PLATFORM="cpu")
    r = subprocess.run(args, capture_output=True, text=True, timeout=600,
                       env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    rep = json.loads(report.read_text())
    assert rep["ok"], rep["failures"]
    assert rep["frames_delivered"] > 0
    assert rep["identity_checked"] == rep["frames_delivered"]
    assert rep["frames_delivered"] <= rep["frames_produced"]
