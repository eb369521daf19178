"""Flag-level validation of the 17 workflow scripts (scripts/*.sh).

The reference ships the same script set (reference scripts/*.sh); ours drive
the unified CLIs in a single environment. These tests statically parse each
script and assert that every `python <driver>.py` invocation:
  * names a driver that exists at the repo root,
  * passes only flags that driver's argparse actually defines,
  * references config files that exist (after substituting each shell
    variable's declared default, plus the commented per-dataset alternates).
This catches driver-flag renames and config renames/typos without running
anything.
"""

from __future__ import annotations

import os
import re
import shlex

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS_DIR = os.path.join(REPO, "scripts")
SCRIPTS = sorted(f for f in os.listdir(SCRIPTS_DIR) if f.endswith(".sh"))


def _driver_flags(driver: str) -> set:
    """Flags defined by the driver's argparse (source-level, no import)."""
    with open(os.path.join(REPO, driver)) as f:
        src = f.read()
    return set(re.findall(r"add_argument\(\s*\n?\s*\"(--[a-z_]+)\"", src))


def _join_continuations(text: str) -> list:
    lines, out = text.splitlines(), []
    buf = ""
    for line in lines:
        stripped = line.rstrip()
        if stripped.endswith("\\"):
            buf += stripped[:-1] + " "
        else:
            out.append(buf + stripped)
            buf = ""
    if buf:
        out.append(buf)
    return out


def _var_defaults(text: str) -> dict:
    """VAR=${VAR:-default} declarations (the editable header block)."""
    return dict(re.findall(r"^(\w+)=\$\{\1:-([^}]*)\}", text, re.M))


def _python_commands(text: str) -> list:
    cmds = []
    for line in _join_continuations(text):
        line = line.strip()
        if line.startswith("python "):
            cmds.append(shlex.split(line, posix=True))
    return cmds


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_flags_accepted_by_driver(script):
    with open(os.path.join(SCRIPTS_DIR, script)) as f:
        text = f.read()
    cmds = _python_commands(text)
    assert cmds, f"{script} contains no python invocations"
    for cmd in cmds:
        driver = cmd[1]
        assert os.path.exists(os.path.join(REPO, driver)), \
            f"{script}: driver {driver} missing"
        allowed = _driver_flags(driver)
        for tok in cmd[2:]:
            if tok.startswith("--"):
                flag = tok.split("=", 1)[0]
                assert flag in allowed, \
                    f"{script}: {driver} does not define {flag}"


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_config_paths_exist(script):
    with open(os.path.join(SCRIPTS_DIR, script)) as f:
        text = f.read()
    defaults = _var_defaults(text)
    # Commented alternates: lines like `# kubric: CONFIG_NAME=x SCENES=(...)`
    # advertise other valid values for a variable; validate them too.
    alternates = {}
    for var, val in re.findall(r"#.*?\b(\w+)=([\w.-]+)", text):
        if var in defaults:
            alternates.setdefault(var, set()).add(val)

    templates = set(re.findall(r"configs/[\w${}./-]+\.(?:gin|yml)", text))
    if not templates:  # metrics.py scripts score render dirs, no configs
        return

    def substitute(template, bindings):
        out = template
        for var, val in bindings.items():
            out = out.replace("${%s}" % var, val).replace("$%s" % var, val)
        return out

    for template in templates:
        candidates = [substitute(template, defaults)]
        for var, vals in alternates.items():
            if "${%s}" % var in template or "$%s" % var in template:
                for val in vals:
                    candidates.append(substitute(template, {**defaults,
                                                            var: val}))
        for path in candidates:
            assert "$" not in path, \
                f"{script}: unresolved variable in config path {path}"
            assert os.path.exists(os.path.join(REPO, path)), \
                f"{script}: config {path} does not exist"
