"""ClickHouse-dialect operators Spark lacks natively, as DataFrame builders.

Each maps one SURVEY.md §2 construct (reference citation in each docstring)
onto a composition of built-in DataFrame ops — no RDDs, no Python row loops —
so Catalyst/AQE still optimize the resulting plan.
"""

from .array_join import array_join
from .asof_join import asof_join
from .distinct_on import distinct_on
from .final import final
from .joins import any_join, join_with_defaults
from .limit_by import limit_by
from .sample import sample_by_key
from .with_fill import with_fill, with_fill_multi
from .with_ties import limit_with_ties
from .with_totals import with_totals

__all__ = [
    "any_join", "array_join", "asof_join", "distinct_on", "final",
    "join_with_defaults", "limit_by", "limit_with_ties", "sample_by_key",
    "with_fill", "with_fill_multi", "with_totals",
]
