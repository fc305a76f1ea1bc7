"""Pallas TPU kernels for the hot ops (pairwise-distance nearest neighbour)."""
