"""Sources & sinks: lineage-capturing reader/writer/frame wrappers."""
