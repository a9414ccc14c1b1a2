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

#: rows-only queries → the checksum twin that carries value evidence.
#: Canonical here; tools/gen_query_index.py renders it into QUERIES.md.
TWIN_OF = {
    "indicator_surface_1h": "indicator_surface_checksum",
    "indicator_batch_150x7": "indicator_batch_checksum",
    "signal_rule_events": "signal_rule_events_checksum",
    "signal_rule_pack_129": "signal_pack_subset_checksum",
    "streaming_pipeline_stores": "streaming_pipeline_checksum",
}

#: rows-only queries whose value evidence is an IN-LANE law (the query
#: itself raises when the law is violated, so the driver's rows-only
#: check cannot go green on wrong values) rather than a checksum twin.
LAW_GATED = {
    "bpe_learn_merges_wide_2048":
        "frozen-encode law at full depth, raises on mismatch",
}

#: Twin staleness bound (r10 verdict item 5): the standing policy
#: re-pins a twin when its LANE changes, but nothing re-pinned one whose
#: lane never changes — the four indicator/signal twins sat at
#: r9-vintage while their rows-only lanes were re-run every round. A
#: twin whose last driver check is >= this many rounds behind the next
#: round MUST occupy a gate slot (tests/test_gate_rotation.py enforces
#: it like the never-checked rule).
TWIN_STALE_GAP = 2


def next_round(ledger: dict[str, dict]) -> int:
    """The round the CURRENT gate front is being composed for: one past
    the newest CORRECTNESS artifact on disk."""
    return max(r["last_checked_round"] for r in ledger.values()) + 1


def stale_twins(ledger: dict[str, dict]) -> list[str]:
    """Checksum twins owed a re-pin: never checked, or last checked
    TWIN_STALE_GAP+ rounds before the upcoming one."""
    n = next_round(ledger)
    out = []
    for twin in sorted(set(TWIN_OF.values())):
        row = ledger.get(twin)
        if row is None or n - row["last_checked_round"] >= TWIN_STALE_GAP:
            out.append(twin)
    return out


def composition(ledger: dict[str, dict], slots: list[str], front: dict):
    """Validate the declared front (``__spark_entry__._GATE_FRONT``)
    against the ledger and the actual gate slots, and return the
    human-readable composition line for README/_GATE_PRIORITY. The r10
    verdict found hand-counted composition prose off by two in three
    places — this makes the counts generated, not remembered.

    Returns (line, errors). ``line`` is None when the declared round no
    longer matches the ledger (a newer artifact landed — rotate first).
    """
    errors: list[str] = []
    n = next_round(ledger)
    if front.get("round") != n:
        return None, [
            f"_GATE_FRONT is for round {front.get('round')} but the newest "
            f"artifact implies round {n} — rotate the front before "
            f"composing prose"
        ]
    born = list(front.get("born", ()))
    changed = list(front.get("changed", ()))
    stale = list(front.get("stale_twins", ()))
    for name in born:
        if name in ledger:
            errors.append(
                f"'{name}' declared born-this-round but has a ledger row "
                f"(last checked r{ledger[name]['last_checked_round']})"
            )
    slot_set = set(slots)
    for cat, names in (("born", born), ("changed", changed),
                       ("stale_twins", stale)):
        for name in names:
            if name not in slot_set:
                errors.append(f"{cat} query '{name}' is not in the gate "
                              f"window _GATE_PRIORITY[:{GATE_CAP}]")
    for twin in stale_twins(ledger):
        if twin not in slot_set:
            errors.append(
                f"stale twin '{twin}' (last check >= {TWIN_STALE_GAP} "
                f"rounds old) must be re-pinned in the gate window"
            )
    categorized = set(born) | set(changed) | set(stale)
    cohort_slots = [s for s in slots if s not in categorized]
    vintages: dict[int, int] = {}
    for s in cohort_slots:
        row = ledger.get(s)
        if row is None:
            errors.append(f"slot '{s}' is uncategorized and has no ledger "
                          f"row — declare it in _GATE_FRONT['born']")
            continue
        vintages[row["last_checked_round"]] = (
            vintages.get(row["last_checked_round"], 0) + 1
        )
    # Oldest-cohort fill rule: a vintage may appear in the cohort slots
    # only if every OLDER vintage is exhausted (fully in slots or
    # categorized). The youngest vintage used may be partial — those
    # leftovers are the round's deferred set.
    used = sorted(vintages)
    deferred: list[str] = []
    if used:
        youngest_used = used[-1]
        for name, row in ledger.items():
            v = row["last_checked_round"]
            if name in slot_set or name in categorized:
                continue
            if v < youngest_used:
                errors.append(
                    f"'{name}' (r{v}-vintage) is deferred while younger "
                    f"r{youngest_used} rows hold cohort slots — fill "
                    f"oldest cohorts first"
                )
            elif v == youngest_used:
                deferred.append(name)
    parts = []
    if born:
        parts.append(f"{len(born)} born")
    if changed:
        parts.append(f"{len(changed)} changed-lane")
    if stale:
        parts.append(f"{len(stale)} stale-twin")
    parts += [f"{vintages[v]} r{v}" for v in used]
    defer_txt = (
        f"deferred {len(deferred)} r{used[-1]}" if deferred else "deferred 0"
    )
    line = (f"front r{n} = " + " + ".join(parts)
            + f" ({len(slots)} slots); {defer_txt}")
    return line, errors


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
    front = getattr(entry, "_GATE_FRONT", None)
    if front is None:
        print("no _GATE_FRONT declared — composition line unavailable")
        return 1
    line, errors = composition(ledger, slots, front)
    for e in errors:
        print(f"FRONT ERROR: {e}")
    if line:
        print(f"composition: {line}")
        print("(paste that line verbatim into README.md and the "
              "_GATE_PRIORITY comment — test_gate_rotation pins it)")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
