"""Batched TPU physics plant and closed-loop simulation engine."""
