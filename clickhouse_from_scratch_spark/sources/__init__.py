"""Format/source registry (SURVEY.md §2.2)."""

from .formats import (
    FORMATS,
    from_native,
    from_row_binary,
    read_format,
    to_native,
    to_row_binary,
    write_format,
)

__all__ = ["FORMATS", "read_format", "write_format",
           "to_native", "from_native", "to_row_binary", "from_row_binary"]
