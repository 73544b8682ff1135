"""Readers and deterministic input synthesis."""
