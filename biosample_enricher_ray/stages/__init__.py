"""Stages: batch-level kernels and actor-pool classes composed into pipelines."""
