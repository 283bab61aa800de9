"""Declared query catalog + pipeline drivers."""
