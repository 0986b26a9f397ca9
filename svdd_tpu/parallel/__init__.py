"""Device-mesh parallelism: DDP/FSDP/TP equivalents via jax.sharding."""

from svdd_tpu.parallel import mesh  # noqa: F401
