"""Device kernels: packed-byte batch tokenization on TPU (JAX/XLA/Pallas)."""
