"""Shared utilities: native-library build/loading, registries, common data."""
