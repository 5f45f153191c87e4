"""PyTorch compatibility layer: reference-checkpoint conversion and a torch
mirror used for parity testing and CPU baseline benchmarking.

Imports torch lazily — the core framework never depends on it.
"""
