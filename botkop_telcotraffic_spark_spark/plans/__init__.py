from .inspect import (
    assert_no_cartesian_without_broadcast,
    audit,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    wholestage_codegen_ids,
)

__all__ = [
    "assert_no_cartesian_without_broadcast",
    "audit",
    "has_broadcast_join",
    "physical_plan",
    "pushed_filters",
    "wholestage_codegen_ids",
]
