"""Stub for the rich console library (pyiceberg uses it only for pretty
schema printing)."""
