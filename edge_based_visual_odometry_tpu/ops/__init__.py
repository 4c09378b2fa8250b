"""Device-side compute kernels (JAX/XLA/Pallas) for the edge-VO pipeline."""
