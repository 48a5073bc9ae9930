"""Physical-plan introspection helpers (pushdown / broadcast / codegen
assertions) — the evidence layer for Catalyst doing its job."""

from .checks import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    pushed_filters,
    wholestage_codegen_count,
)
