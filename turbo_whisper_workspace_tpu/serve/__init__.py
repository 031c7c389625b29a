"""Serving: HTTP API, browser UI, CLI."""
