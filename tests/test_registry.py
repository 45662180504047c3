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
