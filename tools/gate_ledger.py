"""Cumulative driver-gate ledger (r3 verdict item 8).

The verify driver hash-checks only the first 50 resolvable names of
``_GATE_PRIORITY`` each round, so rotation debt — queries that have
never had a driver check — is invisible unless tracked. This tool scans
every ``CORRECTNESS_r*.json`` artifact and writes ``GATE_LEDGER.json``:

    {query_name: {"last_checked_round": N, "hash_match": bool,
                  "rows_match": bool}}

Run after each round's artifacts land (and after editing the gate
tuple) to see what the next round's top-50 must contain::

    python tools/gate_ledger.py

``tests/test_gate_rotation.py`` asserts the invariant from the ledger:
every registered query that has never been hash-checked (or whose last
check was red) must occupy one of the 50 gate slots.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GATE_CAP = 50


def build_ledger() -> dict[str, dict]:
    ledger: dict[str, dict] = {}
    # sort by the PARSED round number, not filename: lexicographic order
    # breaks on unpadded names (r4 after r05..r09) and at r100 vs r11+,
    # letting a stale round overwrite a newer one; names the glob hits
    # but the regex can't parse are skipped, not crashed on
    parsed = []
    for path in REPO.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        if m:
            parsed.append((int(m.group(1)), path))
    for rnd, path in sorted(parsed):
        data = json.loads(path.read_text())
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ledger[name] = {
                "last_checked_round": rnd,
                "hash_match": bool(row.get("hash_match")),
                "rows_match": bool(row.get("rows_match")),
                "spark_rows": row.get("spark_rows"),
                "err": row.get("err"),
            }
    return ledger


def gate_slots() -> list[str]:
    """The names the driver will actually check: first 50 that resolve."""
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    specs = set(entry.queries())
    return [n for n in entry._GATE_PRIORITY if n in specs][:GATE_CAP]


def unchecked(ledger: dict[str, dict], registered: set[str]) -> set[str]:
    """Registered queries that still owe the gate a result: never
    checked in any round, or last checked with a RED hash (a rows-only
    green does not retire hash debt for a query that HAS an oracle —
    e.g. pack_context_windows was rows-green/hash-red in r3 and
    absolutely still needed a slot).

    Retirement rule for oracle-less queries (r4 verdict item 1c): the
    driver records ``rows_match: None, err: 'no_oracle'`` for a query
    with no ``oracle_sql()`` entry — the strongest result the driver can
    ever produce for it. A row with ``spark_rows > 0`` under that err
    therefore RETIRES the debt (the query ran and returned rows; its
    values are gated by its checksum twin + pytest). Without this rule
    those queries pin gate slots forever and the saturation invariant in
    tests/test_gate_rotation.py can never hold again."""
    import __spark_entry__ as entry

    oracles = set(entry.oracle_sql())
    out = set()
    for n in registered:
        row = ledger.get(n)
        if row is None:
            out.add(n)
        elif n in oracles and not row.get("hash_match"):
            out.add(n)
        elif n not in oracles and not row.get("rows_match"):
            rows_only_green = (
                row.get("err") == "no_oracle"
                and (row.get("spark_rows") or 0) > 0
            )
            if not rows_only_green:
                out.add(n)
    return out


def main() -> int:
    ledger = build_ledger()
    (REPO / "GATE_LEDGER.json").write_text(
        json.dumps(ledger, indent=1, sort_keys=True) + "\n"
    )
    # keep the human-readable inventory's driver-check column in step
    import gen_query_index

    (REPO / "QUERIES.md").write_text(gen_query_index.render())
    slots = gate_slots()
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    registered = set(entry.queries())
    debt = unchecked(ledger, registered)
    acked = set(getattr(entry, "_ACKNOWLEDGED_OVERFLOW", ()))
    missing = sorted(debt - set(slots))
    print(f"ledger: {len(ledger)} queries checked across rounds")
    print(f"registered: {len(registered)}; never-green: {len(debt)}")
    print(f"gate[:{GATE_CAP}]: {len(slots)} slots filled")
    unacked = [n for n in missing if n not in acked]
    for n in missing:
        tag = "acknowledged overflow" if n in acked else "UNACKED"
        print(f"  debt: {n} ({tag})")
    if unacked:
        print("ROTATION DEBT — never-green, outside the window, "
              "NOT acknowledged:")
        for n in unacked:
            print(f"  - {n}")
        return 1
    print("rotation OK: all never-green queries are in the gate window "
          "or explicitly acknowledged for next round")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
