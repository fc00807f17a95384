"""Pallas TPU kernels for hot ops.

Availability-gated: every kernel has a pure-XLA fallback in `tdvnet.ops` /
`tdvnet.models`; `use_pallas=True` call sites switch over after the parity
tests (`tests/test_kernels.py`, interpret mode on CPU; real-TPU timing via
`tools/bench_kernels.py`).
"""
