"""Centroidal convex MPC: QP assembly and batched ADMM solver."""
