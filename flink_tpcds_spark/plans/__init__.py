from .checks import (
    explain_text,
    has_broadcast_join,
    has_pushed_filters,
    pushed_filters,
    scan_read_columns,
    unpartitioned_windows,
    whole_stage_codegen_ops,
)

__all__ = [
    "explain_text",
    "pushed_filters",
    "has_pushed_filters",
    "has_broadcast_join",
    "scan_read_columns",
    "unpartitioned_windows",
    "whole_stage_codegen_ops",
]
