"""docs/PARITY_RUNBOOK.md drift gate (VERDICT r4 item 9).

A runbook that references tools which have since changed their CLI is a
runbook that fails on-site. This test re-verifies, every run:

* every ``python <script>`` command in the runbook's code fences points
  at a script that exists;
* each such script still parses ``--help`` (argparse wiring intact) —
  except scripts documented as argument-free (bench.py);
* every backtick-quoted repo path in the prose still exists.
"""

import os
import re
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
RUNBOOK = os.path.join(ROOT, "docs", "PARITY_RUNBOOK.md")

# argument-free entry points: running --help would run the tool itself
NO_HELP = {"bench.py"}


def _runbook_text():
    with open(RUNBOOK) as f:
        return f.read()


def _commands():
    """(script, line) for every ``python <script>`` in a code fence."""
    text = _runbook_text()
    cmds = []
    in_fence = False
    for line in text.splitlines():
        if line.strip().startswith("```"):
            in_fence = not in_fence
            continue
        if in_fence:
            m = re.match(r"\s*python\s+([\w/.\-]+\.py)", line)
            if m:
                cmds.append(m.group(1))
    return cmds


def test_runbook_exists_and_has_commands():
    cmds = _commands()
    assert len(cmds) >= 6, cmds


@pytest.mark.parametrize("script", sorted(set(_commands())))
def test_runbook_script_exists(script):
    assert os.path.isfile(os.path.join(ROOT, script)), (
        f"runbook references {script}, which no longer exists")


@pytest.mark.parametrize(
    "script",
    sorted(s for s in set(_commands())
           if os.path.basename(s) not in NO_HELP))
def test_runbook_script_help_parses(script):
    """--help must exit 0: catches renamed/removed flags breaking the
    documented invocations at the argparse level."""
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, script), "--help"],
        capture_output=True, text=True, timeout=120, cwd=ROOT,
    )
    assert proc.returncode == 0, (
        f"{script} --help failed:\n{proc.stderr[-2000:]}")


def test_runbook_quoted_paths_exist():
    """Backtick-quoted repo-relative paths in the prose must exist."""
    text = _runbook_text()
    missing = []
    for m in re.finditer(r"`((?:tests|tools|recipes|datasets|stac_st_tpu|"
                         r"evaluations|docs)/[\w/.\-]+)`", text):
        path = m.group(1)
        if not os.path.exists(os.path.join(ROOT, path)):
            missing.append(path)
    assert not missing, f"runbook references missing paths: {missing}"


def test_runbook_flags_still_exist():
    """Every --flag used in a runbook command must be accepted by the
    script's parser (checked against its --help output)."""
    text = _runbook_text()
    in_fence = False
    cmd_lines = []
    cur = None
    for line in text.splitlines():
        if line.strip().startswith("```"):
            in_fence = not in_fence
            continue
        if not in_fence:
            continue
        if re.match(r"\s*python\s+[\w/.\-]+\.py", line):
            if cur:
                cmd_lines.append(cur)
            cur = line.strip()
        elif cur and cur.endswith("\\"):
            cur = cur[:-1] + " " + line.strip()
    if cur:
        cmd_lines.append(cur)

    helps = {}
    for cmd in cmd_lines:
        script = re.match(r"python\s+([\w/.\-]+\.py)", cmd).group(1)
        if os.path.basename(script) in NO_HELP:
            continue
        flags = re.findall(r"--([\w\-]+)", cmd)
        if not flags:
            continue
        if script not in helps:
            proc = subprocess.run(
                [sys.executable, os.path.join(ROOT, script), "--help"],
                capture_output=True, text=True, timeout=120, cwd=ROOT)
            helps[script] = proc.stdout + proc.stderr
        # recipes accept arbitrary --key=value hyperparameter overrides;
        # only enforce flags for plain-argparse tools
        if script.startswith("recipes/"):
            continue
        for flag in flags:
            assert f"--{flag}" in helps[script], (
                f"{script}: runbook uses --{flag}, not in --help")
