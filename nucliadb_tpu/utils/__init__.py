"""Shared utilities: platform configuration, timing, ids."""
