"""Guards for the driver-window registry ordering.

The round driver hash-checks the FIRST 50 ``registry()`` entries per
round, so ordering is load-bearing: round 2 rotates the LLM/dedup/
ANN/multimodal flagships into the checked window. These tests keep
the priority list typo-free and loss-free.
"""

from __future__ import annotations

from ods_v3_dbt_spark.plans.declared_queries import (
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
    """Never waste a checked slot: the curated list should cover the
    driver's window exactly (new queries slot in deliberately)."""
    assert len(_ROUND_WINDOW_PRIORITY) == WINDOW


def test_reordering_loses_nothing():
    assert set(registry()) == set(_REGISTRY)
    assert len(registry()) == len(_REGISTRY)
