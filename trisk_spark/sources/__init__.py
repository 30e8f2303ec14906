"""Derived source views: map the driver's generic tables onto the
reference's stream schemas (FIXTURES.md)."""
