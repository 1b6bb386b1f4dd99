"""Data pipeline: dataset adapters, video-batch scheduling, prefetch."""
