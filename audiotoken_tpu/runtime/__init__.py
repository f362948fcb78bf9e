"""Runtime: jit wrappers, shape bucketing, precision policy, executors."""
