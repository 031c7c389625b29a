"""TPU kernels and numeric ops (Pallas where it pays, plain XLA elsewhere)."""
