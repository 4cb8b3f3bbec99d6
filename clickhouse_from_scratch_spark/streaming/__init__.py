"""Streaming surface: LIVE VIEW / WINDOW VIEW on Structured Streaming."""

from .window_view import WindowView, hop, tumble
from .live_view import LiveView
from .session_view import SessionView, session_window, stateful_sessionize
from .dedup import streaming_exact_dedup, streaming_minhash_signatures

__all__ = ["WindowView", "LiveView", "tumble", "hop",
           "SessionView", "session_window", "stateful_sessionize",
           "streaming_exact_dedup", "streaming_minhash_signatures"]
