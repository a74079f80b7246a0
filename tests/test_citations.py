"""Reference-citation integrity sweep (round-3 verdict item #5).

Every Go-file citation (with or without a ``:line`` suffix) in a docstring
or comment must exist in ``/root/reference`` — a fabricated provenance claim
is an evidence defect even when it is not a leak. Pure-filesystem test,
no Spark session.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# any path-shaped token ending in .go, optionally followed by :line[-line]
_CITE = re.compile(r"\b([A-Za-z0-9_][A-Za-z0-9_/.-]*\.go)(?::\d+(?:-\d+)?)?")


def _python_sources() -> list[str]:
    out = []
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [
            d for d in dirs
            if d not in {"__pycache__", ".git", "BENCH", ".pytest_cache"}
        ]
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".py")
        )
    return out


def test_every_cited_go_file_exists_in_reference():
    if not os.path.isdir(REFERENCE):
        import pytest

        pytest.skip("reference tree not present")
    missing: list[tuple[str, str]] = []
    for path in _python_sources():
        with open(path, encoding="utf-8") as f:
            src = f.read()
        for m in _CITE.finditer(src):
            cited = m.group(1)
            if not os.path.isfile(os.path.join(REFERENCE, cited)):
                missing.append((os.path.relpath(path, REPO), cited))
    assert not missing, (
        "citations to nonexistent reference files (fix or remove): "
        f"{sorted(set(missing))}"
    )
