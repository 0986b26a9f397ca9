"""Training loops: diffusion pretrain (optax/orbax) and value-net fit."""
