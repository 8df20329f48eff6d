from orca_tpu.training import losses, optim, swa  # noqa: F401
