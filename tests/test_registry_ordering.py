"""The registration order IS the driver's verification budget — these
tests pin the rotation contract so a silent `_reorder` regression can't
push stale-evidence queries out of the ~50-slot window.
"""

from __future__ import annotations

from frinesis_spark import registry


def _names():
    return list(registry.queries())


def test_tier0_leads_in_declared_order():
    names = _names()
    tier0 = list(registry._CHANGED_SINCE_VERDICT)
    assert names[: len(tier0)] == tier0


def test_stale_tier_sorted_oldest_round_first():
    names = _names()
    tier0 = set(registry._CHANGED_SINCE_VERDICT)
    stale_in_order = [
        n for n in names if n in registry._STALE_EVIDENCE and n not in tier0
    ]
    rounds = [registry._STALE_EVIDENCE[n] for n in stale_in_order]
    assert rounds == sorted(rounds), (
        "stale tier must run oldest evidence first"
    )
    # every stale name precedes every fresh (last-round-verified) name
    last_stale = max(names.index(n) for n in stale_in_order)
    fresh_only = [
        n
        for n in names
        if n in registry._VERIFIED_LAST
        and n not in tier0
        and n not in registry._STALE_EVIDENCE
    ]
    first_fresh = min(names.index(n) for n in fresh_only)
    assert last_stale < first_fresh


def test_oldest_evidence_fits_the_window():
    """Tier 0 + the r1/r2 dozen must all land inside the driver's
    ~50-slot window with heavy margin — they are the rotation's
    non-negotiable front."""
    names = _names()
    oldest = min(registry._STALE_EVIDENCE.values(), default=0)
    critical = set(registry._CHANGED_SINCE_VERDICT) | {
        n for n, rnd in registry._STALE_EVIDENCE.items() if rnd == oldest
    }
    positions = [names.index(n) for n in critical]
    assert max(positions, default=0) < 50


def test_every_tier_name_is_registered():
    registered = set(_names())
    assert set(registry._CHANGED_SINCE_VERDICT) <= registered
    assert set(registry._STALE_EVIDENCE) <= registered
    assert registry._VERIFIED_LAST <= registered


def test_oracle_order_mirrors_query_order():
    qnames = [n for n in _names() if n in registry.oracle_sql()]
    assert list(registry.oracle_sql()) == qnames


def test_window_capacity_invariant():
    """r9 verdict item 2: the 141-query / 50-slot / 2-round-evidence
    arithmetic is a TESTED invariant, not a convention.  The cap lives
    in two places (registry.py enforces at registration, refresh_tiers
    asserts at round start) — pin that they agree and that the current
    state fits."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "refresh_tiers",
        pathlib.Path(__file__).resolve().parents[1] / "tools" / "refresh_tiers.py",
    )
    rt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rt)

    assert rt.REGISTRY_CAP == registry.REGISTRY_CAP
    assert rt.REGISTRY_CAP == rt.GUARANTEE_ROUNDS * (
        rt.WINDOW_SLOTS - rt.CHURN_BUDGET
    )

    names = _names()
    assert len(names) <= registry.REGISTRY_CAP

    # The oldest-stale backlog (rows that MUST verify this round to
    # keep the guarantee) + never-verified registrations (tier 1 —
    # in NO list; they also need a slot now) + expected churn must
    # fit one window.
    oldest = min(registry._STALE_EVIDENCE.values(), default=0)
    must = [n for n, r in registry._STALE_EVIDENCE.items() if r == oldest]
    never = [
        n
        for n in names
        if n not in registry._STALE_EVIDENCE
        and n not in registry._VERIFIED_LAST
        and n not in registry._CHANGED_SINCE_VERDICT
    ]
    ok, problems = rt.window_capacity_ok(len(names), len(must), len(never))
    assert ok, problems

    # And the must-verify rows actually sit inside the window.
    positions = [names.index(n) for n in must]
    assert max(positions, default=0) < rt.WINDOW_SLOTS


def test_rows_only_set_is_closed():
    """EVERY registered query carries an oracle — the rows-only set
    reached zero in r9 (VERDICT r8 item 2): dedup_near_minhash and
    dedup_simhash now grade their hash-family candidate pairs against
    the exact-Jaccard pair set in-query and emit a recall-floor
    boolean the oracle asserts, the same self-grading contract that
    took the HLL sketch and the ANN pair off the list in r8. A new
    operator landing without an oracle must either get one or be
    added HERE with its declared justification."""
    rows_only: set[str] = set()
    q = set(registry.queries())
    o = set(registry.oracle_sql())
    assert q - o == rows_only
