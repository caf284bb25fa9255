"""Mesh / sharding utilities."""
