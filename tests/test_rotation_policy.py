"""Rotation-policy meta-test (round-8 VERDICT directive 3).

Driver CORRECTNESS evidence is recorded for EXACTLY the first 50
names emitted by ``__spark_entry__.queries()`` each round, so
evidence debt re-accumulates silently unless the rotation head is
provably the stalest-evidence slice of the catalog. This test pins
the policy mechanically:

    _PRIORITY[:50] == _FRESH_HEAD (rows whose implementation or
    oracle changed this round — documented exemption, outranks age)
    followed by the oldest-evidence catalog rows, age computed from
    every CORRECTNESS_r*.json in the repo root, ties broken by
    catalog registration order. Never-swept rows have age 0 (oldest
    of all).

When a round's sweep lands, the next builder regenerates _PRIORITY
with the same algorithm; if they drift, THIS test names the exact
rows out of place instead of a judge discovering stale evidence two
rounds later.
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entry_mod
from twitter_analysis_spark import catalog

ROOT = os.path.dirname(os.path.abspath(entry_mod.__file__))


def _latest_evidence() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(path)).group(1))
        try:
            rows = json.load(open(path))
        except ValueError:
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def expected_rotation(n_slots: int = 50) -> list[str]:
    latest = _latest_evidence()
    order = {name: i for i, name in enumerate(catalog.QUERIES)}
    head = [n for n in entry_mod._FRESH_HEAD if n in order]
    rest = sorted((n for n in order if n not in head),
                  key=lambda n: (latest.get(n, 0), order[n]))
    return head + rest[: n_slots - len(head)]


def test_priority_head_is_the_stalest_evidence_slice():
    want = expected_rotation()
    got = [n for n in entry_mod._PRIORITY if n in catalog.QUERIES][:50]
    assert got == want, {
        "unexpected_in_head": [n for n in got if n not in want],
        "missing_from_head": [n for n in want if n not in got],
        "order_mismatch": got != want,
    }


def test_fresh_head_rows_exist_and_are_few():
    # The exemption list must name real catalog rows and stay small —
    # it spends evidence-budget slots that age-based rotation would
    # otherwise use (round-8 VERDICT directive 7).
    assert set(entry_mod._FRESH_HEAD) <= set(catalog.QUERIES)
    assert len(entry_mod._FRESH_HEAD) <= 5


def test_queries_order_matches_priority():
    # queries() must actually emit the rotation order the driver sees.
    names = list(entry_mod.queries())
    assert names[: len(entry_mod._PRIORITY)] == [
        n for n in entry_mod._PRIORITY if n in catalog.QUERIES]
    assert set(names) == set(catalog.QUERIES)
