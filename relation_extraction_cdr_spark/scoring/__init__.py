"""Pair scoring: deterministic stub scorer (CI) + optional ONNX path."""
