"""Framework utilities: checkpointing, profiling, torch-checkpoint import."""
