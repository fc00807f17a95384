"""Training loop, optimizer schedules, checkpointing, logging."""
