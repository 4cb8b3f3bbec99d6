"""Format/source registry (SURVEY.md §2.2)."""

from .formats import FORMATS, read_format, write_format

__all__ = ["FORMATS", "read_format", "write_format"]
