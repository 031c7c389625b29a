"""Text/signal analysis: security monitoring, preprocessing, diagnostics,
visualization, audio info."""
