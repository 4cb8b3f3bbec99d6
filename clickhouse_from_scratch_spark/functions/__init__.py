"""ClickHouse function-name registry → PySpark expressions."""

from .registry import REGISTRY, ch, has_function

__all__ = ["REGISTRY", "ch", "has_function"]
