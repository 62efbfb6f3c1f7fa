"""Scalar / encoding helper functions shared by sources and sinks."""
