"""Scalar/column function library (text analysis, multimodal helpers)."""
