"""Training loop: jitted steps, optimizer/scheduler, checkpointing, callbacks, loggers."""
