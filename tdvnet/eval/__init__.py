"""Evaluation suite: metrics, whole-scene harness, fusion, reconstruction."""
