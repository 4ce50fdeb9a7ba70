"""Deterministic Twitter-shaped fixtures (FIXTURES.md).

Generates, with a fixed seed:
- ``users``  — 500 flat user rows (mirrors MySQL users_info,
  DataProcessing.ipynb:cell32)
- ``tweets`` — 2000 curated tweet rows with nested entities /
  quoted_status / retweets[] (mirrors the Mongo document,
  DataProcessing.ipynb:cell16 + cell19 output shape)
- ``raw_stream.jsonl`` — ~1000 raw capture lines with known
  composition: originals, RT-prefixed retweets with nested
  retweeted_status, quotes, malformed lines, delete events, duplicate
  ids (mirrors corona-out-2, cell8) — plus a golden-count manifest the
  ETL tests assert against (the analogue of the reference's printed
  invariants: 10,984 tweets / 19,232 users).

Everything is plain Python dicts; the conftest fixture writes them to
parquet/jsonl under a session tmp dir using Spark itself.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

SEED = 42

KEYWORDS = [f"kw{i}" for i in range(40)] + ["corona", "virus", "house",
                                            "election", "spark", "python",
                                            "data", "news", "music", "game"]
HASHTAGS = [f"tag{i}" for i in range(25)] + ["covid", "stayhome", "vote",
                                             "ai", "breaking"]
LANGS = ["en", "fr", "ge", "in"]  # per app.py:78
FILLER = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua").split()

BASE_DT = datetime(2020, 4, 1, 0, 0, 0, tzinfo=timezone.utc)


def twitter_date(dt: datetime) -> str:
    """'Sun Apr 12 18:47:53 +0000 2020' (cell 10 output / app.py:33)."""
    return dt.strftime("%a %b %d %H:%M:%S +0000 %Y")


def _text(rng: random.Random, plant_kw: str | None) -> str:
    words = rng.choices(FILLER, k=rng.randint(5, 25))
    if plant_kw:
        pos = rng.randrange(len(words) + 1)
        # mixed case to exercise the (?i) path
        kw = plant_kw.upper() if rng.random() < 0.3 else plant_kw
        words.insert(pos, kw)
    return " ".join(words)


def _entities(rng: random.Random) -> dict:
    tags = rng.sample(HASHTAGS, k=rng.choices([0, 1, 2, 3, 4],
                                              weights=[30, 35, 20, 10, 5])[0])
    mentions = [
        {"id": 1000 + rng.randrange(500), "id_str": str(1000 + rng.randrange(500)),
         "indices": [0, 8], "name": "Some User", "screen_name": f"user{rng.randrange(500)}"}
        for _ in range(rng.choices([0, 1, 2], weights=[60, 30, 10])[0])
    ]
    return {
        "hashtags": [{"text": t, "indices": [10, 10 + len(t)]} for t in tags],
        "symbols": [],
        "urls": ([{"url": "https://t.co/x", "expanded_url": "https://example.com",
                   "display_url": "example.com", "indices": [0, 12]}]
                 if rng.random() < 0.2 else []),
        "user_mentions": mentions,
    }


def make_users(n: int = 500, rng: random.Random | None = None) -> list[dict]:
    rng = rng or random.Random(SEED)
    users = []
    for i in range(n):
        users.append({
            "id": str(1000 + i),
            "name": f"User Number {i}",
            "screen_name": f"user{i}",
            "location": rng.choice(["NY", "SF", "London", None, "Paris"]),
            "description": rng.choice([None, "just tweeting", "engineer",
                                        "musician", ""]),
            "verified": i % 20 == 0,                      # ~5%
            # distinct everywhere -> deterministic top-5 (FIXTURES.md)
            "followers_count": 1_000_000 - i * 137,
            "friends_count": (i * 31) % 5000,
            "created_at": twitter_date(BASE_DT - timedelta(days=i)),
        })
    return users


def _status(rng: random.Random, sid: int, user_idx: int,
            ts: datetime, lang: str, with_quote: bool) -> dict:
    kw = rng.choice(KEYWORDS) if rng.random() < 0.35 else None
    st = {
        "_id": str(sid),
        "id_str": str(sid),
        "user_id": str(1000 + user_idx),
        "text": _text(rng, kw),
        "created_at": twitter_date(ts),
        "lang": lang,
        "favorite_count": rng.choices([0, 1, 2, 5, 10, 100, 1000],
                                      weights=[40, 20, 15, 10, 8, 5, 2])[0],
        "retweet_count": rng.randrange(0, 50),
        "quote_count": rng.randrange(0, 5),
        "reply_count": rng.randrange(0, 20),
        "is_quote_status": with_quote,
        "entities": _entities(rng),
    }
    if with_quote:
        st["quoted_status"] = {
            "_id": str(sid + 5_000_000), "id_str": str(sid + 5_000_000),
            "user_id": str(1000 + rng.randrange(500)),
            "text": _text(rng, rng.choice(KEYWORDS)),
            "created_at": twitter_date(ts - timedelta(hours=3)),
            "lang": rng.choice(LANGS),
            "favorite_count": rng.randrange(0, 500),
            "retweet_count": rng.randrange(0, 50),
            "quote_count": 0, "reply_count": rng.randrange(0, 5),
            "entities": _entities(rng),
        }
    else:
        st["quoted_status"] = None
    return st


def make_tweets(n: int = 2000, rng: random.Random | None = None) -> list[dict]:
    """Curated (post-ETL) tweets with retweets[] arrays."""
    rng = rng or random.Random(SEED + 1)
    tweets = []
    for i in range(n):
        sid = 1_249_000_000 + i
        # skewed authorship: 10 hot users own ~30% of tweets
        user_idx = rng.randrange(10) if rng.random() < 0.3 else rng.randrange(500)
        ts = BASE_DT + timedelta(minutes=rng.randrange(30 * 24 * 60))
        lang = rng.choices(LANGS, weights=[70, 12, 10, 8])[0]
        t = _status(rng, sid, user_idx, ts, lang, with_quote=rng.random() < 0.15)
        n_rts = rng.choices([0, 1, 2, 5, 12, 40],
                            weights=[45, 25, 15, 10, 4, 1])[0]
        if i == 7:          # guarantee one tweet with >30 retweets (T6)
            n_rts = 37
        t["retweets"] = [
            {
                "_id": str(sid * 10 + j), "id_str": str(sid * 10 + j),
                "user_id": str(1000 + rng.randrange(500)),
                "text": "RT @" + f"user{user_idx}: " + t["text"][:40],
                "created_at": twitter_date(ts + timedelta(minutes=j + 1)),
                "lang": lang,
                "favorite_count": rng.randrange(0, 50),
                "retweet_count": 0, "quote_count": 0,
                "reply_count": rng.randrange(0, 3),
                "entities": _entities(rng),
            }
            for j in range(n_rts)
        ]
        tweets.append(t)
    return tweets


def make_raw_stream(n: int = 1000) -> tuple[list[str], dict]:
    """Raw JSON-lines capture + golden-count manifest.

    Composition (FIXTURES.md): ~35% originals, ~55% retweets, ~5%
    quotes, ~5% malformed/deletes, ~3% duplicates appended at the end.
    Some originals exist ONLY inside a retweeted_status (never as their
    own line); several retweets share one original so the retweets[]
    array aggregates >1 element.
    """
    rng = random.Random(SEED + 2)
    users = make_users(500, random.Random(SEED))

    def raw_user(idx: int) -> dict:
        u = users[idx]
        return {
            "id": int(u["id"]), "id_str": u["id"], "name": u["name"],
            "screen_name": u["screen_name"], "location": u["location"],
            "description": u["description"], "verified": u["verified"],
            "followers_count": u["followers_count"],
            "friends_count": u["friends_count"], "created_at": u["created_at"],
        }

    def raw_status(sid: int, user_idx: int, ts: datetime,
                   text: str, lang: str = "en", quote: dict | None = None) -> dict:
        return {
            "created_at": twitter_date(ts),
            "id": sid, "id_str": str(sid), "text": text,
            "user": raw_user(user_idx),
            "timestamp_ms": str(int(ts.timestamp() * 1000)),
            "lang": lang,
            "favorite_count": rng.randrange(0, 100),
            "retweet_count": rng.randrange(0, 40),
            "quote_count": rng.randrange(0, 5),
            "reply_count": rng.randrange(0, 10),
            "is_quote_status": quote is not None,
            "entities": _entities(rng),
            **({"quoted_status": quote} if quote is not None else {}),
        }

    lines: list[str] = []
    n_orig = int(n * 0.35)
    n_rt = int(n * 0.55)
    n_quote = int(n * 0.05)
    n_bad = n - n_orig - n_rt - n_quote

    # originals (a few coincidentally starting with "RTX" — lookalike,
    # still classified original because the rule is startswith("RT"):
    # FIXTURES.md wants the lookalike to NOT start with exactly "RT"… a
    # text beginning "RTX" DOES start with "RT", so it is classified as
    # a retweet by the reference's rule; we keep one to pin that exact
    # behavior).
    sid = 2_000_000
    for i in range(n_orig):
        uidx = rng.randrange(500)
        ts = BASE_DT + timedelta(minutes=rng.randrange(30 * 24 * 60))
        text = _text(rng, rng.choice(KEYWORDS) if rng.random() < 0.4 else None)
        if i == 3:
            text = "RTX lookalike " + text   # starts with "RT" -> retweet path!
        st = raw_status(sid, uidx, ts, text)
        lines.append(json.dumps(st))
        sid += 1

    # retweets: ~40% reference an original line above; 60% reference a
    # hoisted-only original. Several share targets (assembly >1).
    targets: list[dict] = []
    for i in range(120):
        t_uidx = rng.randrange(500)
        t_ts = BASE_DT + timedelta(minutes=rng.randrange(30 * 24 * 60))
        quote = None
        if rng.random() < 0.2:
            q_uidx = rng.randrange(500)
            quote = raw_status(sid + 7_000_000, q_uidx, t_ts - timedelta(hours=2),
                               _text(rng, None), "en")
        st = raw_status(sid, t_uidx, t_ts, _text(rng, rng.choice(KEYWORDS)),
                        quote=quote)
        targets.append(st)
        sid += 1

    for i in range(n_rt):
        og = rng.choice(targets)
        uidx = rng.randrange(500)
        ts = BASE_DT + timedelta(minutes=rng.randrange(30 * 24 * 60))
        rt = raw_status(sid, uidx, ts,
                        f"RT @{og['user']['screen_name']}: {og['text'][:80]}")
        rt["retweeted_status"] = og
        lines.append(json.dumps(rt))
        sid += 1

    # quote tweets (original lines with quoted_status)
    for i in range(n_quote):
        uidx = rng.randrange(500)
        q_uidx = rng.randrange(500)
        ts = BASE_DT + timedelta(minutes=rng.randrange(30 * 24 * 60))
        quote = raw_status(sid + 7_500_000, q_uidx, ts - timedelta(hours=1),
                           _text(rng, None))
        st = raw_status(sid, uidx, ts, _text(rng, "corona"), quote=quote)
        lines.append(json.dumps(st))
        sid += 1

    # malformed / non-status lines (skipped by permissive ingest)
    bad_pool = [
        '{"delete": {"status": {"id": 123, "id_str": "123"}}}',
        '{truncated json...',
        '',
        '{"limit": {"track": 42}}',
        'not json at all',
    ]
    for i in range(n_bad):
        lines.append(bad_pool[i % len(bad_pool)])

    # exact-duplicate lines (dedup A3)
    dup_candidates = [ln for ln in lines if '"retweeted_status"' not in ln
                      and ln.startswith('{"created_at"')]
    n_dups = len(dup_candidates[: int(n * 0.03)])
    lines.extend(dup_candidates[: int(n * 0.03)])

    rng.shuffle(lines)
    golden = compute_golden(lines)
    golden["n_duplicate_lines"] = n_dups
    return lines, golden


def compute_golden(lines: list[str]) -> dict:
    """Golden counts derived by re-parsing the capture with the
    reference's exact classification semantics (cell16/cell34):
    text startswith 'RT' -> retweet (its retweeted_status is the
    original; RT without retweeted_status == reference exception);
    users harvested from exactly user / retweeted_status.user /
    quoted_status.user; dedup by id_str."""
    golden = {"n_original_lines": 0, "n_retweet_lines": 0,
              "n_rt_without_status": 0, "n_bad_lines": 0, "n_lines": len(lines)}
    original_ids: set[str] = set()
    user_ids: set[str] = set()
    for ln in lines:
        try:
            d = json.loads(ln)
            if not isinstance(d, dict) or "id_str" not in d:
                raise ValueError
        except ValueError:
            golden["n_bad_lines"] += 1
            continue
        if d["text"].startswith("RT"):
            if "retweeted_status" in d:
                golden["n_retweet_lines"] += 1
                original_ids.add(d["retweeted_status"]["id_str"])
            else:
                golden["n_rt_without_status"] += 1   # ref: exception path
        else:
            golden["n_original_lines"] += 1
            original_ids.add(d["id_str"])
        for path in (d.get("user"),
                     d.get("retweeted_status", {}).get("user"),
                     d.get("quoted_status", {}).get("user")):
            if path:
                user_ids.add(path["id_str"])
    golden["n_unique_originals"] = len(original_ids)
    golden["n_unique_users"] = len(user_ids)
    return golden
