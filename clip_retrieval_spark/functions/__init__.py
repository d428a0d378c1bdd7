"""Scalar / batch function library (pure Python + numpy, JVM-side helpers)."""
