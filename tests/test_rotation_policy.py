"""Rotation-policy meta-test (round-8 VERDICT directive 3).

Driver CORRECTNESS evidence is recorded for EXACTLY the first 50
names emitted by ``__spark_entry__.queries()`` each round, so
evidence debt re-accumulates silently unless the rotation head is
provably the stalest-evidence slice of the catalog. Since round 9 the
head is COMPUTED at import from the ``CORRECTNESS_r*.json`` files
(rounds 1-8 regenerated it by hand — the drift hazard this closes),
with a ``_FRESH_HEAD`` exemption for rows whose implementation or
oracle changed after their latest evidence. This module re-implements
the policy independently and asserts the entry module's computation
agrees, plus pins the auto-advance / auto-retire behavior on
synthetic evidence so a sweep landing cannot silently freeze the
rotation.
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
    # Independent re-implementation (do NOT call the entry module's).
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.fullmatch(r"CORRECTNESS_r0*(\d+)\.json",
                         os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except ValueError:
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def expected_rotation(latest: dict[str, int],
                      n_slots: int = 50) -> list[str]:
    order = {name: i for i, name in enumerate(catalog.QUERIES)}
    head = [n for n, changed in entry_mod._FRESH_HEAD.items()
            if n in order and latest.get(n, 0) < changed]
    rest = sorted((n for n in order if n not in head),
                  key=lambda n: (latest.get(n, 0), order[n]))
    return head + rest[: n_slots - len(head)]


def test_priority_head_is_the_stalest_evidence_slice():
    want = expected_rotation(_latest_evidence())
    got = [n for n in entry_mod._PRIORITY if n in catalog.QUERIES][:50]
    assert got == want, {
        "unexpected_in_head": [n for n in got if n not in want],
        "missing_from_head": [n for n in want if n not in got],
        "order_mismatch": got != want,
    }


def test_rotation_auto_advances_when_a_sweep_lands(monkeypatch):
    """The head must move by itself when new evidence appears: give
    every current head row fresh evidence and the computed rotation
    must promote 50 different (now-stalest) rows — the exact failure
    mode of the hand-maintained list was a sweep landing with nobody
    regenerating the head."""
    latest = dict(_latest_evidence())
    new_round = max(latest.values(), default=0) + 1
    before = expected_rotation(latest)
    for name in before:
        latest[name] = new_round
    monkeypatch.setattr(entry_mod, "_latest_evidence", lambda: latest)
    after = entry_mod._compute_rotation()
    assert len(after) == 50
    assert set(after).isdisjoint(before), sorted(set(after) & set(before))
    # and the promoted rows are exactly the stalest remainder
    assert after == expected_rotation(latest)


def test_fresh_head_auto_retires_once_swept(monkeypatch):
    """A _FRESH_HEAD exemption spends a rotation slot only while the
    row's evidence predates its change round; once the driver records
    it, age-based ordering resumes without anyone editing the dict.

    Built on a SYNTHETIC evidence board (every row carries identical
    fresh evidence) — the r11 incarnation asserted the victim falls
    out of the head against the LIVE board, which is false whenever
    the 50-slot head legitimately reaches the victim's evidence tier
    by age (exactly what the r11 sweep's tier retirement caused)."""
    if not entry_mod._FRESH_HEAD:
        return
    name, changed = next(iter(entry_mod._FRESH_HEAD.items()))
    # Same fresh evidence everywhere: no exemption in the dict stays
    # active (latest >= its change round) and age ordering alone
    # reduces to catalog registration order.
    fresh = max(entry_mod._FRESH_HEAD.values())
    latest = {n: fresh for n in catalog.QUERIES}
    monkeypatch.setattr(entry_mod, "_latest_evidence", lambda: latest)

    # evidence predates the change -> the exemption pins the victim
    # at the head regardless of age
    latest[name] = changed - 1
    assert entry_mod._compute_rotation()[0] == name

    # a sweep records the row -> the exemption is inert and the
    # rotation is EXACTLY the pure age ordering (registration order
    # on an all-equal board): the victim is no longer pinned
    latest[name] = fresh
    assert entry_mod._compute_rotation() == list(catalog.QUERIES)[:50]


def test_never_swept_rows_outrank_everything_but_fresh_head(monkeypatch):
    latest = dict(_latest_evidence())
    swept = [n for n in catalog.QUERIES if latest.get(n, 0) > 0]
    if not swept:
        return
    victim = swept[-1]
    latest.pop(victim, None)
    monkeypatch.setattr(entry_mod, "_latest_evidence", lambda: latest)
    head = entry_mod._compute_rotation()
    n_fresh = len([n for n, c in entry_mod._FRESH_HEAD.items()
                   if latest.get(n, 0) < c])
    unswept = [n for n in catalog.QUERIES if latest.get(n, 0) == 0
               and n not in head[:n_fresh]]
    assert head[n_fresh:n_fresh + len(unswept)] == unswept


def test_stray_evidence_files_are_ignored(tmp_path):
    """A backup copy (CORRECTNESS_r99_old.json) or a malformed file
    must neither pollute evidence ages nor throw the computation onto
    the static fallback — only canonical CORRECTNESS_r<N>.json names
    count."""
    import shutil

    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        shutil.copy(path, tmp_path / os.path.basename(path))
    want = _latest_evidence()

    # stray copy claiming round-99 evidence for every row, an
    # unparseable canonical-adjacent name, and a non-JSON suffix
    real = sorted(glob.glob(str(tmp_path / "CORRECTNESS_r*.json")))[0]
    rows = json.load(open(real))
    (tmp_path / "CORRECTNESS_r99_old.json").write_text(
        json.dumps({n: {} for n in rows}))
    (tmp_path / "CORRECTNESS_rX.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r98.json.bak").write_text("not json")

    assert entry_mod._latest_evidence(str(tmp_path)) == want


def test_rotation_degrades_to_static_fallback(monkeypatch):
    """The driver imports this module; a malformed evidence file must
    degrade to the last hand-staged head, never raise."""
    monkeypatch.setattr(entry_mod, "_latest_evidence",
                        lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    assert entry_mod._compute_rotation() == entry_mod._STATIC_FALLBACK
    monkeypatch.setattr(entry_mod, "_latest_evidence", lambda: {})
    assert entry_mod._compute_rotation() == entry_mod._STATIC_FALLBACK


def test_fresh_head_rows_exist_and_are_few():
    # The exemption map must name real catalog rows and stay small —
    # it spends evidence-budget slots that age-based rotation would
    # otherwise use (round-8 VERDICT directive 7).
    assert set(entry_mod._FRESH_HEAD) <= set(catalog.QUERIES)
    assert len(entry_mod._FRESH_HEAD) <= 5


def test_static_fallback_names_real_rows():
    assert set(entry_mod._STATIC_FALLBACK) <= set(catalog.QUERIES)
    assert len(entry_mod._STATIC_FALLBACK) == 50


def test_queries_order_matches_priority():
    # queries() must actually emit the rotation order the driver sees.
    names = list(entry_mod.queries())
    assert names[: len(entry_mod._PRIORITY)] == [
        n for n in entry_mod._PRIORITY if n in catalog.QUERIES]
    assert set(names) == set(catalog.QUERIES)
