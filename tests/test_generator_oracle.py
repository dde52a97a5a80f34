"""M0: the fixtures themselves must be deterministic and the oracle sane."""

import json
import os

from airbyte_module_spark.oracle import apply_events, table_digest
from airbyte_module_spark.sources.generator import FeedSpec, generate_feed


def _read_all(d):
    out = {}
    for name in sorted(os.listdir(d)):
        with open(os.path.join(d, name)) as f:
            out[name] = f.read()
    return out


def test_generator_deterministic(tmp_path):
    e1 = generate_feed(FeedSpec(seed=7, n_events=200), str(tmp_path / "a"))
    e2 = generate_feed(FeedSpec(seed=7, n_events=200), str(tmp_path / "b"))
    assert e1 == e2
    assert _read_all(tmp_path / "a") == _read_all(tmp_path / "b")
    e3 = generate_feed(FeedSpec(seed=8, n_events=200), str(tmp_path / "c"))
    assert e1 != e3


def test_feed_has_required_mix(tmp_path):
    """FIXTURES.md F2: inserts, updates, deletes, duplicates, late events,
    ties, and noise lines must all occur."""
    events = generate_feed(FeedSpec(seed=42, n_events=400), str(tmp_path / "f"))
    ops = [e["record"]["data"]["op"] for e in events]
    assert {"i", "u", "d"} <= set(ops)
    seen, dups = set(), 0
    for e in events:
        k = json.dumps(e, sort_keys=True)
        dups += k in seen
        seen.add(k)
    assert dups > 0, "no duplicate replays"
    cursors = [e["record"]["emitted_at"] for e in events]
    assert any(b < a for a, b in zip(cursors, cursors[1:])), "no late events"
    raw = "".join(_read_all(tmp_path / "f").values())
    assert '"type": "LOG"' in raw or '"LOG"' in raw
    assert '"STATE"' in raw


def test_oracle_lww_and_delete():
    def ev(op, seq, emitted, content="x", repo="r", path="p"):
        return {
            "type": "RECORD",
            "record": {
                "stream": "repo_files",
                "emitted_at": emitted,
                "data": {
                    "op": op, "seq": seq, "repo": repo, "path": path,
                    "commit": "c" * 40, "lang": "py", "content": content,
                },
            },
        }

    # LWW: higher cursor wins regardless of order
    final = apply_events([ev("i", 1, 100, "old"), ev("u", 2, 200, "new")])
    assert final.iloc[0]["content"] == "new"
    final = apply_events([ev("u", 2, 200, "new"), ev("i", 1, 100, "old")])
    assert final.iloc[0]["content"] == "new"
    # tie on emitted_at → seq breaks it
    final = apply_events([ev("u", 2, 100, "b"), ev("i", 1, 100, "a")])
    assert final.iloc[0]["content"] == "b"
    # delete wins → key absent; later lower-cursor update still loses
    final = apply_events(
        [ev("i", 1, 100), ev("d", 3, 300, None), ev("u", 2, 200, "late")]
    )
    assert len(final) == 0
    # normalization applied
    final = apply_events([ev("i", 1, 100, "a  \r\nb\t\n")])
    assert final.iloc[0]["content"] == "a\nb\n"


def test_oracle_digest_order_independent():
    rows = [
        {"type": "RECORD", "record": {"stream": "s", "emitted_at": i,
         "data": {"op": "i", "seq": i, "repo": f"r{i}", "path": "p",
                  "commit": "c", "lang": "py", "content": f"x{i}"}}}
        for i in range(10)
    ]
    a = apply_events(rows)
    b = apply_events(list(reversed(rows)))
    cols = ["repo", "path", "commit", "lang", "content"]
    assert table_digest(a, cols) == table_digest(b, cols)
