"""Pallas TPU kernels for the framework's hottest sequential ops."""
