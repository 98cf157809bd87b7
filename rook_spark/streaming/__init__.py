"""Streaming operators beyond the CDC apply loop: windowed aggregation
with watermarks, session windows, and custom stateful processing via
applyInPandasWithState."""
