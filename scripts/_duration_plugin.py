"""pytest plugin used by record_test_durations.py: dump per-test call
durations to $DURATIONS_OUT as JSON."""

import json
import os

_durations = {}


def pytest_runtest_logreport(report):
    if report.when == "call":
        _durations[report.nodeid.replace("\\", "/")] = round(
            report.duration, 2)


def pytest_sessionfinish(session, exitstatus):
    out = os.environ.get("DURATIONS_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(_durations, f)
