"""Pure-function JAX models with pytree parameters."""
