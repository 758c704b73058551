#!/usr/bin/env python
"""Rebuild the registry verification tiers from the newest
CORRECTNESS_r{N}.json — the first chore of every round.

The driver verifies ~50 queries per round in registration order, so
``frinesis_spark/registry.py`` orders queries into tiers:

  0. changed since the last verdict (must be re-verified) — this tool
     cannot know what the next round changes, so it emits an EMPTY
     tier-0 stub to fill in by hand as code changes land;
  1. never driver-verified (implicit: not in any list);
  2. stale evidence — green in SOME earlier round but absent from the
     newest artifact (their rotation priority);
  3. green in the newest artifact (freshest, cheapest to skip).

Usage: ``python tools/refresh_tiers.py`` prints the generated tier
block plus a budget summary; ``--write`` splices the block directly
into registry.py between the ``TIERS BEGIN``/``TIERS END`` markers
(r14 verdict: the hand-paste step left stale counts behind twice, so
the generated comments now carry NO counts — counts live only in the
stdout budget summary, where they cannot drift when tier-0
promotions later move names out of the lists). Reads every
CORRECTNESS_r*.json in the repo root; "green" means hash_match (or a
rows-only row with no error).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# --- verification-window arithmetic (r10 policy, r9 verdict item 2) ---
# The driver verifies WINDOW_SLOTS queries per round; the standing
# guarantee is "every registered query's latest green driver evidence is
# at most GUARANTEE_ROUNDS-1 rounds old", i.e. each query is re-verified
# at least once per GUARANTEE_ROUNDS consecutive windows.  Cycle
# capacity is therefore GUARANTEE_ROUNDS * WINDOW_SLOTS slot-uses,
# shared between one-visit-per-query rotation and tier-0 re-checks of
# changed queries (observed churn r7-r9: ~3/round).  That fixes the
# registry cap: REGISTRY_CAP = GUARANTEE_ROUNDS * (WINDOW_SLOTS -
# CHURN_BUDGET).  Policy (documented in registry.py's tier header): net
# registrations are FROZEN at REGISTRY_CAP; adding a query above the cap
# requires retiring one or formally renegotiating the guarantee there.
WINDOW_SLOTS = 50
GUARANTEE_ROUNDS = 3
CHURN_BUDGET = 3  # average tier-0 slots consumed per round
REGISTRY_CAP = GUARANTEE_ROUNDS * (WINDOW_SLOTS - CHURN_BUDGET)  # = 141

# Splice markers in registry.py for --write; everything between them is
# machine-generated (plus the hand-added tier-0 names).
_MARK_BEGIN = "# === TIERS BEGIN (tools/refresh_tiers.py --write) ==="
_MARK_END = "# === TIERS END ==="


def window_capacity_ok(
    n_registered: int,
    n_must_verify: int,
    n_never: int = 0,
) -> tuple[bool, list[str]]:
    """Check the verification-window arithmetic; returns (ok, problems).

    ``n_must_verify`` is the count of queries whose evidence would fall
    OUT of the guarantee at the next verdict unless verified this round
    (last green == newest - GUARANTEE_ROUNDS + 1); ``n_never`` counts
    never-verified (new) registrations, which also need a slot now.
    """
    problems: list[str] = []
    if n_registered > REGISTRY_CAP:
        problems.append(
            f"registry has {n_registered} queries > cap {REGISTRY_CAP} "
            f"({GUARANTEE_ROUNDS}x({WINDOW_SLOTS}-{CHURN_BUDGET})) — the "
            f"{GUARANTEE_ROUNDS - 1}-round evidence guarantee no longer fits; "
            "retire a query or renegotiate the guarantee in registry.py"
        )
    if n_must_verify + n_never + CHURN_BUDGET > WINDOW_SLOTS:
        problems.append(
            f"this round MUST verify {n_must_verify} oldest-stale + "
            f"{n_never} never-verified + ~{CHURN_BUDGET} tier-0 churn "
            f"> {WINDOW_SLOTS} window slots — the guarantee breaks THIS "
            "round; freeze registrations and demote non-behavioral tier-0"
        )
    return (not problems, problems)


def _green(row: dict) -> bool:
    if row.get("err") not in (None, "no_oracle"):
        return False
    if row.get("hash_match") is True:
        return True
    # rows-only check: no oracle, spark side produced rows without error
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def main() -> None:
    artifacts: dict[int, dict] = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            artifacts[int(m.group(1))] = json.loads(p.read_text())
    if not artifacts:
        raise SystemExit("no CORRECTNESS_r*.json artifacts found")
    newest = max(artifacts)

    from frinesis_spark import registry

    # Enumerate via _load_modules, NOT registry.queries(): queries()
    # validates the CURRENT tier lists and raises on exactly the
    # stale-tier state this tool exists to repair (r9 review wave 5 —
    # chicken-and-egg: rename a query and the refresh tool crashed).
    registered: set[str] = set()
    for mod in registry._load_modules():
        registered |= set(mod.QUERIES)

    fresh = {
        n for n, row in artifacts[newest].items() if _green(row) and n in registered
    }
    # Fresh FAILURES surface loudly, not as routine rotation: a query
    # red in the newest artifact was previously printed under "stale
    # evidence" (or "never verified") and the round-start "fix
    # regressions first" chore never saw it (r9 review wave 5; r2
    # really did have 12 failing rows).
    failed_newest = {
        n
        for n, row in artifacts[newest].items()
        if not _green(row) and n in registered
    }
    last_green: dict[str, int] = {}
    for rnd in sorted(artifacts):
        for n, row in artifacts[rnd].items():
            if _green(row) and n in registered:
                last_green[n] = rnd
    stale = {n for n, rnd in last_green.items() if rnd < newest and n not in fresh}
    never = registered - fresh - stale

    if failed_newest:
        print(f"# !!! {len(failed_newest)} queries FAILED in CORRECTNESS_r{newest:02d}")
        print("# !!! fix these FIRST; they are listed below by their last")
        print("# !!! GREEN round (or as never-verified if none):")
        for n in sorted(failed_newest):
            print(f"# !!!   {n} (last green: r{last_green.get(n, '-')})")

    # The generated block carries NO counts — hand tier-0 promotions
    # move names out of these lists after the refresh, and a count
    # written here would silently go stale (the r13/r14 ADVICE nit,
    # twice). Counts live in the stdout budget summary below.
    lines: list[str] = []
    lines.append(f"# Tiers generated from CORRECTNESS_r{newest:02d} by "
                 "tools/refresh_tiers.py --write.")
    lines.append(f"# tier 0 (changed since the r{newest} verdict): hand-add "
                 f"names here as r{newest + 1}")
    lines.append("# changes land, REMOVING them from the list below that "
                 "held them")
    lines.append("# (_check_tiers enforces disjointness).")
    lines.append("_CHANGED_SINCE_VERDICT = (\n)\n")
    lines.append(f"# tier 2: stale evidence — last green before r{newest}; "
                 "name -> last-green")
    lines.append("# round, the _reorder sort key (oldest evidence claims "
                 "window slots first)")
    lines.append("_STALE_EVIDENCE = {")
    for n in sorted(stale, key=lambda n: (last_green[n], n)):
        lines.append(f'    "{n}": {last_green[n]},')
    lines.append("}\n")
    lines.append(f"# tier 3: green in CORRECTNESS_r{newest:02d}")
    lines.append("_VERIFIED_LAST = frozenset(")
    lines.append("    {")
    for n in sorted(fresh):
        lines.append(f'        "{n}",')
    lines.append("    }\n)")
    block = "\n".join(lines)

    if "--write" in sys.argv:
        reg_path = REPO / "frinesis_spark" / "registry.py"
        text = reg_path.read_text()
        begin, end = _MARK_BEGIN + "\n", "\n" + _MARK_END
        i, j = text.find(begin), text.find(end)
        if i < 0 or j < 0 or j < i:
            raise SystemExit(
                f"splice markers not found in {reg_path} — expected "
                f"{_MARK_BEGIN!r} ... {_MARK_END!r}"
            )
        reg_path.write_text(text[: i + len(begin)] + block + text[j:])
        print(f"# wrote tier block into {reg_path}")
    else:
        print(block)

    print(f"# budget: tier1 (never verified) = {len(never)} queries:")
    for n in sorted(never):
        print(f"#   {n}")
    print(f"# window fill: {len(never)} never + {len(stale)} stale "
          f"= {len(never) + len(stale)} ahead of the {len(fresh)} fresh rows")

    # Window-arithmetic invariant (r9 verdict item 2): fail LOUDLY at
    # refresh time, not at verdict time.  must-verify = queries whose
    # evidence hits the guarantee boundary at the next verdict.
    boundary = newest - GUARANTEE_ROUNDS + 1
    must = {n for n, rnd in last_green.items()
            if rnd <= boundary and n not in fresh}
    ok, problems = window_capacity_ok(len(registered), len(must), len(never))
    print(f"# capacity: {len(registered)}/{REGISTRY_CAP} registered; "
          f"{len(must)} rows at the r{boundary} guarantee boundary + "
          f"{len(never)} never + ~{CHURN_BUDGET} churn vs {WINDOW_SLOTS} slots")
    if not ok:
        for p in problems:
            print(f"# !!! WINDOW CAPACITY: {p}", file=sys.stderr)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
