"""Mesh/sharding scale-out: thousands of concurrent scenarios across chips."""
