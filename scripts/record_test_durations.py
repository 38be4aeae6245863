"""Regenerate tests/durations.json for the fast/slow auto-marking.

tests/conftest.py marks any test whose recorded call time exceeds its
threshold as ``slow``; the default regression profile is
``pytest -m "not slow"``.  Durations drift across machines, so re-run
this whenever the fast profile stops fitting its budget:

    python scripts/record_test_durations.py

Each test FILE runs in its own pytest subprocess: the full suite in
one process accumulates enough allocator state on a small box to
segfault partway through (observed twice in test_mllava_next after
~150 green tests), and per-file isolation also keeps one bad file from
losing every other file's numbers.  Existing entries for files that
fail to run are preserved.
"""

import glob
import json
import os
import subprocess
import sys


def main():
    root = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        ".."))
    os.chdir(root)
    out_path = os.path.join("tests", "durations.json")
    try:
        with open(out_path) as f:
            durations = json.load(f)
    except OSError:
        durations = {}

    files = sorted(glob.glob("tests/test_*.py"))
    plugin = os.path.join("scripts", "_duration_plugin.py")
    failures = []
    for i, path in enumerate(files):
        tmp = f"/tmp/durations_{os.path.basename(path)}.json"
        env = dict(os.environ, DURATIONS_OUT=tmp)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", path, "-q",
             "-p", "no:cacheprovider", "-p", "_duration_plugin"],
            env=dict(env, PYTHONPATH=os.path.dirname(plugin)
                     + os.pathsep + env.get("PYTHONPATH", "")),
            capture_output=True, text=True)
        try:
            with open(tmp) as f:
                durations.update(json.load(f))
            os.remove(tmp)
        except OSError:
            failures.append(path)
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        print(f"[{i + 1}/{len(files)}] {path}: {tail}", flush=True)

    with open(out_path, "w") as f:
        json.dump(durations, f, indent=0, sort_keys=True)
    print(f"wrote {len(durations)} durations to {out_path}; "
          f"{len(failures)} file(s) without results: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
