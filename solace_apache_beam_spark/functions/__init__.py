"""Scalar/array function layer: portable hashing, shingling, text
analysis. Everything here is built-in Catalyst expressions (no Python in
the hot path) with DuckDB-equivalent SQL fragments for the oracle gate.
"""
