"""Reusable DataFrame -> DataFrame operators.

OSM-core operators mirror the reference's semantics (cited per module);
the training-data operators (dedup, similarity, text, multimodal) extend
the engine for 100 TB-scale corpus pipelines.
"""
