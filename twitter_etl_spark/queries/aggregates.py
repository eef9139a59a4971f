"""Stub module — filled in this round."""

QUERIES: dict = {}
ORACLE: dict = {}
