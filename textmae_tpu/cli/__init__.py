"""Command-line entry points (train / test / generate_scores / MAE workloads)."""
