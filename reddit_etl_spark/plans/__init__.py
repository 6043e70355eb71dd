"""Plan inspection: the engine's explain-and-iterate tooling."""

from .inspect import (  # noqa: F401
    count_exchanges,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    uses_take_ordered,
    whole_stage_codegen_ops,
)
