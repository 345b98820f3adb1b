"""Experimental kernels: working, tested code that did NOT beat the
production path and is kept out of the production ops surface.

``fused_cnn``: the whole-CNN-stack Pallas megakernel (activations never
leave VMEM). A documented negative result — at the task's channel counts
(16/32/64) XLA's folded conv stack wins end-to-end by ~5x at B=2048
(BENCHMARKS.md "encoder megakernel"); the MXU is starved at these widths
regardless of tiling, so the HBM-traffic savings never pay back. Kept
importable behind ``CNNEncoder(impl='pallas')`` with full parity tests
(tests/test_fused_cnn.py) for anyone who wants to extend it.
"""
