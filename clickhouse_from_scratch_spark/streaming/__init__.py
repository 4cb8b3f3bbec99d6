"""Streaming surface: LIVE VIEW / WINDOW VIEW on Structured Streaming."""

from .window_view import WindowView, hop, tumble
from .live_view import LiveView

__all__ = ["WindowView", "LiveView", "tumble", "hop"]
