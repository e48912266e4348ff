"""Stdlib-only format parsers that run inside Arrow-batched UDFs."""
