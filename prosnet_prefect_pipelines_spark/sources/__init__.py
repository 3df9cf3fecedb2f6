"""Scans / sources (SURVEY §2.1)."""
