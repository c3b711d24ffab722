"""Cross-cutting product components: KB/cluster management, catalog, locking."""
