"""First-party audio I/O and signal utilities (host side)."""
