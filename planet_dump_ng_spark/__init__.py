"""planet_dump_ng_spark — a PySpark-native analytics/ETL engine with the
query and data-processing capabilities of zerebubuth/planet-dump-ng.

The reference (C++03/Boost, /root/reference) is a fixed-plan batch ETL
pipeline: pg_dump archive -> typed table scans -> external sort -> streaming
sort-merge joins (element x tags x inners) -> decorator filters -> XML/PBF
sinks.  This package re-expresses every operator Spark-first:

- ``sources``   : COPY-text decode (dump_reader.cpp / unescape_copy_row.hpp)
                  and Parquet staging with resume markers (dump_archive.cpp).
- ``operators`` : element assembly joins (copy_elements.cpp), the
                  latest-version "history filter" (history_filter.cpp),
                  attribution joins (changeset_map.cpp), anonymization,
                  plus large-scale training-data operators (dedup,
                  similarity search, text analysis, multimodal) that the
                  100 TB deployment needs.
- ``functions`` : the scalar-function surface (SURVEY.md section 2.6).
- ``sinks``     : OSM XML (xml_writer.cpp) and PBF (pbf_writer.cpp) writers.
- ``plans``     : declarative headline queries used by the driver gates.
- ``streaming`` : Structured Streaming variants of the batch operators.

Everything is DataFrame/Catalyst-first; Python UDFs appear only where the
built-in operators genuinely cannot express the semantics (stateful binary
encoders in sinks, vectorized hashing in dedup).
"""

__version__ = "0.1.0"
