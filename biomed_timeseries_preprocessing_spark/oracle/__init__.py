"""Subpackage: oracle."""
