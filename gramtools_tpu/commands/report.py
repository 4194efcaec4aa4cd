"""JSON run reports: per-step success/runtime/traceback accounting.

Schema parity with the reference's command reports
(gramtools/commands/report.py:14-96): the on-disk JSON must carry the
same keys ("success", "processes" with per-step {"success", "run_time",
"traceback"}, "total_runtime", "current_working_directory", "paths",
"path_hashes", "version_report") so downstream tooling reads either
tool's reports. The implementation here is a context-manager timer
around each step rather than a wrapping decorator.
"""
from __future__ import annotations

import functools
import hashlib
import json
import logging
import os
import time
import traceback

from .. import __version__

log = logging.getLogger("gramtools_tpu")


def new_report() -> dict:
    return {"success": "", "processes": {}, "start_time": str(int(time.time()))}


class _StepTimer:
    """Times one pipeline step and folds the outcome into the report.

    On exception: records the traceback under the step, writes the
    report to disk and exits(1) -- a failed step must still leave a
    readable report behind (the reference's contract)."""

    def __init__(self, report: dict, step_name: str, paths):
        self.report = report
        self.step = step_name
        self.paths = paths

    def __enter__(self):
        self._t0 = int(time.time())
        return self

    def __exit__(self, exc_type, exc, tb):
        elapsed = int(time.time()) - self._t0
        ok = exc is None
        entry = {"success": ok, "run_time": elapsed}
        if not ok:
            tb_text = "".join(traceback.format_exception(exc_type, exc, tb))
            entry["traceback"] = tb_text.split("\n")
        # a step may pre-populate details for itself; keep them
        prior = self.report["processes"].get(self.step)
        self.report["processes"][self.step] = (
            entry if prior is None else {**entry, **prior})
        self.report["success"] = ok
        if not ok:
            log.error("Traceback: \n%s", tb_text)
            log.error("Unsuccessful %s. Reported to %s", self.step,
                      self.paths.report)
            save_report(self.report, self.paths)
            raise SystemExit(1)
        return False


def with_report(step_fn):
    """Run ``step_fn(report, step_name, paths, *args)`` under a
    _StepTimer keyed by ``step_name``."""

    @functools.wraps(step_fn)
    def timed_step(report, step_name, paths, *args):
        with _StepTimer(report, step_name, paths):
            return step_fn(report, step_name, paths, *args)

    return timed_step


def _file_hash(file_path) -> str:
    sha = hashlib.sha256()
    with open(file_path, "rb") as fh:
        for block in iter(lambda: fh.read(1 << 23), b""):
            sha.update(block)
    return sha.hexdigest()


def hash_command_paths(command_paths: dict) -> dict:
    """sha256 per existing input/output file (lists hash per-element)."""
    hashes = {}
    for name, item in command_paths.items():
        if isinstance(item, list):
            hashes[name] = {str(p): _file_hash(p) for p in item
                            if p.is_file()}
        elif item.is_file():
            hashes[name] = _file_hash(item)
    return hashes


def _version_report() -> dict:
    """Parity: gramtools/version/report.py (version + embedded commit)."""
    info = {"version_number": __version__}
    try:
        import subprocess
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)), timeout=5)
        if commit.returncode == 0:
            info["last_git_commit_hash"] = commit.stdout.strip()
    except Exception:
        pass
    return info


def save_report(report: dict, command_paths, command_hash_paths=None):
    now = int(time.time())
    started = int(report.pop("start_time", now))
    report["total_runtime"] = now - started
    report["current_working_directory"] = os.getcwd()
    report["paths"] = command_paths.dict()
    report["path_hashes"] = command_hash_paths
    report["version_report"] = _version_report()
    with open(command_paths.report, "w") as fh:
        json.dump(report, fh, indent=4)
