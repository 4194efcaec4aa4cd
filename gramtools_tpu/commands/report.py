"""JSON run reports with per-step success/runtime/traceback.

Parity: gramtools/commands/report.py:14-96.
"""
from __future__ import annotations

import collections
import hashlib
import json
import logging
import os
import time
import traceback

from .. import __version__

log = logging.getLogger("gramtools_tpu")


def new_report():
    return collections.OrderedDict(
        {"success": "", "processes": collections.OrderedDict(),
         "start_time": str(time.time()).split(".")[0]})


def with_report(f):
    def reportify(report, action, command_paths, *args):
        success = True
        timer_start = time.time()
        original_result = None
        traceback_string = ""
        try:
            original_result = f(report, action, command_paths, *args)
        except Exception as e:
            success = False
            traceback_string = "".join(
                traceback.format_exception(type(e), e, e.__traceback__))
        timer_end = time.time()

        report["success"] = success
        process_report = collections.OrderedDict(
            {"success": success, "run_time": int(timer_end) - int(timer_start)})
        if not success:
            process_report["traceback"] = traceback_string.split("\n")
        if action not in report["processes"]:
            report["processes"][action] = process_report
        else:
            report["processes"][action] = {**process_report,
                                           **report["processes"][action]}
        if not success:
            log.error("Traceback: \n%s", traceback_string)
            log.error("Unsuccessful %s. Reported to %s", action,
                      command_paths.report)
            save_report(report, command_paths)
            raise SystemExit(1)
        return original_result

    return reportify


def _file_hash(file_path):
    sha = hashlib.sha256()
    with open(file_path, "rb") as f:
        while True:
            data = f.read(int(1e7))
            if not data:
                break
            sha.update(data)
    return sha.hexdigest()


def hash_command_paths(command_paths):
    out = {}
    for command, component in command_paths.items():
        if isinstance(component, list):
            out[command] = {str(p): _file_hash(p) for p in component if p.is_file()}
        elif component.is_file():
            out[command] = _file_hash(component)
    return out


def _version_report():
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


def save_report(report, command_paths, command_hash_paths=None):
    end_time = str(time.time()).split(".")[0]
    start_time = report.pop("start_time", end_time)
    report.update(collections.OrderedDict([
        ("total_runtime", int(end_time) - int(start_time)),
        ("current_working_directory", os.getcwd()),
        ("paths", command_paths.dict()),
        ("path_hashes", command_hash_paths),
        ("version_report", _version_report()),
    ]))
    with open(command_paths.report, "w") as fh:
        json.dump(report, fh, indent=4)
