"""Pipelines: end-to-end Ray Data compositions of the stages."""
