"""Stub arviz for reference --no-bayes runs (arviz not in this image).
Only imported, never called, on the point-estimation paths."""
def __getattr__(name):
    raise ImportError(f"arviz stub: '{name}' not available in this environment")
