"""Relational + custom operators (SURVEY §2.3-2.6 and scale extensions)."""
