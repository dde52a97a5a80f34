"""Pure-Python/pandas oracle for the CDC semantics (FIXTURES.md "Oracle &
invariants"). The engine's golden tests compare its final table state against
this oracle — mirroring the reference's golden-diff discipline
(``/root/reference/tests/test_fybrik.sh:144-162``).

Semantics under test (BASELINE.json north_star):
- group events by identity key ``(repo, path)``;
- last-writer-wins by cursor ``(emitted_at, seq)``;
- if the winning event is a delete the key is absent from the final state;
- content is normalized (CRLF→LF, trailing whitespace stripped) and
  fingerprinted with sha256.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from airbyte_module_spark.functions.content import normalize_py


def apply_events(
    events: list[dict],
    initial: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Apply envelope events (as produced by generator.generate_feed) on top
    of an optional initial table state; return the expected final table
    sorted by (repo, path).

    Columns: all data fields except op/seq, plus ``content_sha``.
    """
    state: dict[tuple[str, str], dict] = {}
    if initial is not None:
        for row in initial.to_dict("records"):
            key = (row["repo"], row["path"])
            state[key] = {**row, "_cursor": (row.get("_ab_emitted_at", -1), row.get("_ab_seq", -1))}

    for ev in events:
        if ev.get("type") != "RECORD":
            continue
        rec = ev["record"]
        data = rec["data"]
        key = (data["repo"], data["path"])
        cursor = (rec["emitted_at"], data["seq"])
        prev = state.get(key)
        if prev is not None and prev["_cursor"] >= cursor:
            continue  # older (or replayed) event loses — LWW
        row = {k: v for k, v in data.items() if k not in ("op", "seq")}
        row["_cursor"] = cursor
        row["_op"] = data["op"]
        state[key] = row

    rows = []
    for (repo, path), row in state.items():
        if row.get("_op") == "d":
            continue
        content = normalize_py(row.get("content"))
        out = {k: v for k, v in row.items() if not k.startswith("_")}
        out["repo"], out["path"] = repo, path
        out["content"] = content
        out["content_sha"] = (
            hashlib.sha256(content.encode()).hexdigest() if content is not None else None
        )
        rows.append(out)
    if not rows:
        return pd.DataFrame(columns=["repo", "path", "commit", "lang", "content", "content_sha"])
    df = pd.DataFrame(rows).sort_values(["repo", "path"]).reset_index(drop=True)
    return df


def table_digest(
    df: pd.DataFrame, cols: list[str] | None = None, commutative: bool = False
) -> str:
    """Order- and partitioning-independent digest: sha256 over the sorted
    per-row sha256 fingerprints. Matches the engine's digest definition.

    ``commutative=True`` mirrors ``LakeTable.digest(commutative=True)`` —
    sha256 of ``count:sum(24-bit prefix):xor(60-bit prefix)`` over the same
    per-row hashes (the 10^10-row engine form that folds through
    map-side-combining aggregates instead of a sorted collect)."""
    cols = cols or [c for c in df.columns if c != "content_sha"]
    row_hashes = [
        hashlib.sha256(
            "|".join("" if pd.isna(v) else str(v) for v in row).encode()
        ).hexdigest()
        for row in df[cols].itertuples(index=False)
    ]
    if commutative:
        n = len(row_hashes)
        s = sum(int(h[:6], 16) for h in row_hashes)
        x = 0
        for h in row_hashes:
            x ^= int(h[:15], 16)
        return hashlib.sha256(f"{n}:{s}:{x}".encode()).hexdigest()
    return hashlib.sha256("\n".join(sorted(row_hashes)).encode()).hexdigest()
