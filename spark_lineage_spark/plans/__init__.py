"""Lineage plan-walking: model, extraction, column lineage, reporters."""
