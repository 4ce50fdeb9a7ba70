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


def test_plans_md_covers_every_headline_query():
    """docs/PLANS.md is regenerated per round over bench.HEADLINE +
    tools/gen_plans.EXTRAS; if the headline list grows without a
    regeneration, the plan-audit artifact silently under-covers
    (round-8 verdict hygiene item). Section headers are `## <name>`."""
    import sys

    sys.path.insert(0, ROOT)
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import bench
    from gen_plans import EXTRAS

    text = open(os.path.join(ROOT, "docs", "PLANS.md")).read()
    sections = set(re.findall(r"^## (\S+)$", text, re.MULTILINE))
    # gen_plans covers catalog-resolvable names; the bench-only
    # xxhash64 twins (bench._extra_queries) share their catalog
    # sibling's plan shape and are excluded there by construction.
    from twitter_analysis_spark import catalog
    want = {n for n in set(bench.HEADLINE) | set(EXTRAS)
            if n in catalog.QUERIES}
    assert sections == want, {
        "missing_from_plans": sorted(want - sections),
        "stale_in_plans": sorted(sections - want),
    }
