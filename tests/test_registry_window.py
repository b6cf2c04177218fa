"""Guards for the driver-window registry ordering.

The round driver hash-checks the FIRST 50 ``registry()`` entries per
round, so ordering is load-bearing: round 2 rotates the LLM/dedup/
ANN/multimodal flagships into the checked window. These tests keep
the priority list typo-free and loss-free.
"""

from __future__ import annotations

from ods_v3_dbt_spark.plans.declared_queries import (
    _RECENT_ADDITIONS,
    _REGISTRY,
    _ROUND_WINDOW_PRIORITY,
    registry,
)

WINDOW = 50


def test_priority_names_all_registered():
    missing = [n for n in _ROUND_WINDOW_PRIORITY if n not in _REGISTRY]
    assert not missing, f"priority list has unregistered names: {missing}"


def test_priority_names_unique():
    assert len(set(_ROUND_WINDOW_PRIORITY)) == len(_ROUND_WINDOW_PRIORITY)


def test_window_is_exactly_the_priority_list():
    head = list(registry())[: len(_ROUND_WINDOW_PRIORITY)]
    assert head == list(_ROUND_WINDOW_PRIORITY)


def test_priority_fills_driver_window():
    """Never waste a checked slot: the curated list must cover the
    driver's 50-row window (entries past 50 just order the staleness
    rotation's tail and roll forward next round)."""
    assert len(_ROUND_WINDOW_PRIORITY) >= WINDOW


def test_recent_additions_inside_driver_window():
    """Round-12 verdict task 2: the window froze at its round-6 state
    and no round-7..12 addition was ever driver-sampled. Every row in
    the recent-additions ledger must sit inside the first 50 registry
    entries until a CORRECTNESS_r*.json records it green."""
    head = set(list(registry())[:WINDOW])
    missing = [n for n in _RECENT_ADDITIONS if n not in head]
    assert not missing, (
        f"recent additions outside the driver's 50-row window: {missing}"
    )


def test_reordering_loses_nothing():
    assert set(registry()) == set(_REGISTRY)
    assert len(registry()) == len(_REGISTRY)
