"""Standalone developer tools mirroring the reference's side utilities."""
