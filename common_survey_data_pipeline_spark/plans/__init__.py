"""Plan-shape introspection: helpers for asserting the physical plans
Catalyst produces (broadcast build sides, top-k strategy, pushdown)."""

from .asserts import (
    OPAQUE_SCAN,
    broadcast_scan_tables,
    broadcast_scanned_tables,
    broadcast_subtrees,
    no_auto_broadcast,
    operator_order,
    partitionless_windows,
    plan_of,
    scanned_tables,
    subtree_of,
)

__all__ = [
    "OPAQUE_SCAN",
    "broadcast_scan_tables",
    "broadcast_scanned_tables",
    "broadcast_subtrees",
    "no_auto_broadcast",
    "operator_order",
    "partitionless_windows",
    "plan_of",
    "scanned_tables",
    "subtree_of",
]
