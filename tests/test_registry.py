"""Registry surface invariants — the driver-contract hygiene the round-5
review caught by hand (a mid-round registration silently became surface
entry 51, past the driver's ~50-entry window): every registration must be
an EXPLICIT surface decision, and the surface must stay exactly the size
the driver reads."""

from __future__ import annotations

from vector_db_example_spark.queries import QUERIES
from vector_db_example_spark.queries.registry import (
    DRIVER_CRITICAL,
    DRIVER_EXCLUDED,
    driver_queries,
)


def test_surface_is_exactly_fifty():
    # the driver stops after ~50 entries; entry 51 would appear surfaced
    # while never receiving a verdict
    assert len(driver_queries()) == 50


def test_critical_and_excluded_are_disjoint():
    overlap = set(DRIVER_CRITICAL) & DRIVER_EXCLUDED
    assert not overlap, f"both surfaced and excluded: {sorted(overlap)}"


def test_every_registration_is_an_explicit_surface_decision():
    # a new @register() must be placed in DRIVER_CRITICAL (surfaced) or
    # DRIVER_EXCLUDED (held for a documented rotation) — never neither,
    # which is how the 51st-entry bug happened
    undecided = set(QUERIES) - set(DRIVER_CRITICAL) - DRIVER_EXCLUDED
    assert not undecided, (
        f"registered but neither surfaced nor held out: {sorted(undecided)}"
    )


def test_rotation_lists_reference_real_queries():
    for name in DRIVER_CRITICAL:
        assert name in QUERIES, f"DRIVER_CRITICAL ghost entry: {name}"
    for name in DRIVER_EXCLUDED:
        assert name in QUERIES, f"DRIVER_EXCLUDED ghost entry: {name}"


def test_surface_order_puts_critical_first():
    # never-driver-verified entries rotate to the FRONT; the dict order
    # the driver iterates must begin with DRIVER_CRITICAL verbatim
    assert tuple(driver_queries())[: len(DRIVER_CRITICAL)] == DRIVER_CRITICAL


def test_readme_counts_match_registry():
    """The README's capability-count sentence must be DERIVED, not
    hand-written (VERDICT r11 task 6 — the hand-kept numbers drifted in
    two consecutive rounds): this asserts the prose against the live
    registry so the next drift fails CI instead of shipping."""
    import re
    from pathlib import Path

    readme = Path(__file__).resolve().parent.parent / "README.md"
    m = re.search(
        r"(\d+) registered queries \(`vector_db_example_spark/queries/`\), "
        r"(\d+) of them checked",
        readme.read_text(),
    )
    assert m, "README capability-count sentence not found"
    total, oracled = int(m.group(1)), int(m.group(2))
    assert total == len(QUERIES), (
        f"README says {total} registered queries; registry holds "
        f"{len(QUERIES)} — update the README sentence"
    )
    real_oracled = sum(1 for q in QUERIES.values() if q.oracle is not None)
    assert oracled == real_oracled, (
        f"README says {oracled} oracle-checked; registry holds "
        f"{real_oracled} — update the README sentence"
    )
    # the prose also claims "The N remaining are approximate or
    # inherently sequential by design" — keep that derived too
    m2 = re.search(r"The (\d+) remaining are approximate", readme.read_text())
    assert m2 and int(m2.group(1)) == len(QUERIES) - real_oracled


def test_surface_is_fully_oracle_backed():
    # the README's "ALL of them oracle-backed" claim about the driver
    # surface, derived (rows-only entries live in DRIVER_EXCLUDED since
    # the round-7 rotation)
    assert all(q.oracle is not None for q in driver_queries().values())
