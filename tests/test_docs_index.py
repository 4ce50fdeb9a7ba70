"""docs/SCALE.md is an auditable index: every `tests/...::test_name`
citation in it must point at a test that actually exists, and every
`tas/...` path at a real file — otherwise the 100 TB audit trail rots
silently the first time a test is renamed."""

from __future__ import annotations

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scale_md_citations_resolve():
    text = open(os.path.join(ROOT, "docs", "SCALE.md")).read()

    # `tests/<file>.py::test_name` citations; bare `::test_name`
    # continuations inherit the most recent file. Walk all backtick
    # tokens in order to resolve them.
    tokens = re.findall(r"`([^`]+)`", text)
    current_file = None
    resolved = []
    for t in tokens:
        m = re.match(r"(tests/[\w/]+\.py)::(test_\w+)$", t)
        if m:
            current_file = m.group(1)
            resolved.append((current_file, m.group(2)))
            continue
        m = re.match(r"::(test_\w+)$", t)
        if m and current_file:
            resolved.append((current_file, m.group(1)))

    assert resolved, "SCALE.md lost its test citations entirely?"
    missing = []
    for f, name in resolved:
        p = os.path.join(ROOT, f)
        if not os.path.exists(p):
            missing.append(f)
        elif f"def {name}(" not in open(p).read():
            missing.append(f"{f}::{name}")
    assert missing == [], missing

    # `tas/...` file paths (module citations)
    bad_paths = []
    for m in re.finditer(r"`tas/([\w/]+\.py)", text):
        p = os.path.join(ROOT, "twitter_analysis_spark", m.group(1))
        if not os.path.exists(p):
            bad_paths.append(m.group(0))
    assert bad_paths == [], bad_paths
