"""Data models: the internal index message ("brain") and API models."""
