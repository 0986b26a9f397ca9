"""Reverse-diffusion sampling: jitted scan loop + guidance transforms."""

from svdd_tpu.sampling import sampler  # noqa: F401
from svdd_tpu.sampling import guidance  # noqa: F401
