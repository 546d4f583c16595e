"""Math ops: rotations, spatial algebra, batched linear algebra, Pallas kernels."""
