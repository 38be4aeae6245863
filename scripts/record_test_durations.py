"""Regenerate tests/durations.json for the fast/slow auto-marking.

tests/conftest.py marks any test whose recorded call time exceeds its
threshold as ``slow``; the default regression profile is
``pytest -m "not slow"``.  Durations drift across machines, so re-run
this (full suite, one process) whenever the fast profile stops fitting
its budget:

    python scripts/record_test_durations.py

Extra pytest args pass through (e.g. ``-x``).
"""

import json
import os
import sys

import pytest


class _Recorder:
    def __init__(self):
        self.durations = {}

    def pytest_runtest_logreport(self, report):
        if report.when == "call":
            self.durations[report.nodeid.replace("\\", "/")] = round(
                report.duration, 2)


def main():
    root = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        ".."))
    os.chdir(root)
    sys.path.insert(0, root)
    rec = _Recorder()
    rc = pytest.main(
        ["tests/", "-q", "-p", "no:cacheprovider"] + sys.argv[1:],
        plugins=[rec])
    out = os.path.join("tests", "durations.json")
    with open(out, "w") as f:
        json.dump(rec.durations, f, indent=0, sort_keys=True)
    print(f"wrote {len(rec.durations)} durations to {out} "
          f"(pytest rc={rc})")
    return rc


if __name__ == "__main__":
    sys.exit(main())
