"""TPU/array compute kernels: rzip matcher stages, filters, gates."""
