"""Device-side (JAX/XLA/Pallas) decode stages."""
