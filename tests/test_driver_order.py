"""The driver-order rotation property (VERDICT r6 item 7): the green
tail is LRU by last-green round, never-green queries always lead, and
every registry name appears exactly once."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from common_survey_data_pipeline_spark.workload import REGISTRY


def test_never_green_queries_come_first():
    names = list(REGISTRY)
    last_green = {n: 3 for n in names[:10]}
    order = entry._driver_order(last_green)
    assert order[: len(names) - 10] == [n for n in names if n not in last_green]


def test_green_tail_is_lru_by_round():
    names = list(REGISTRY)
    # everything green; alternate rounds 2 and 5
    last_green = {n: (2 if i % 2 == 0 else 5) for i, n in enumerate(names)}
    order = entry._driver_order(last_green)
    rounds = [last_green[n] for n in order]
    assert rounds == sorted(rounds)  # oldest green first
    # ties keep registry order
    twos = [n for n in order if last_green[n] == 2]
    assert twos == [n for n in names if last_green[n] == 2]


def test_rotation_bounds_staleness():
    """Simulate the driver loop: each round the first CAP names get a
    green row stamped with that round. Within ceil(N/CAP) rounds every
    query must have been re-verified."""
    names = list(REGISTRY)
    cap = 50
    last_green = {n: 1 for n in names}  # all green long ago
    seen_round: dict[str, int] = {}
    n_rounds = -(-len(names) // cap)  # ceil
    for rnd in range(2, 2 + n_rounds):
        order = entry._driver_order(dict(last_green))
        for n in order[:cap]:
            last_green[n] = rnd
            seen_round[n] = rnd
    assert set(seen_round) == set(names), (
        f"{len(names) - len(seen_round)} queries never re-verified "
        f"in {n_rounds} rounds"
    )


def test_every_registry_name_exactly_once():
    order = entry._driver_order({})
    assert sorted(order) == sorted(REGISTRY)
    order2 = entry._driver_order()  # real committed records
    assert sorted(order2) == sorted(REGISTRY)
