"""Reusable column-expression helpers (arrays, text, hashing)."""
