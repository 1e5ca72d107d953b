"""Logical pipeline assembly (batch + streaming plans)."""
