"""Explicit StructType schemas for the reference's 12 input relations.

Reference: typed structs /root/reference/include/types.hpp:29-240, canonical
column lists /root/reference/src/types.cpp:5-14, extraction table list
/root/reference/src/planet-dump.cpp:127-140.  Nullability mirrors
optional<T> fields (Postgres ``\\N``, unescape_copy_row.hpp:152-163).

Type mapping (SURVEY.md section 1.5):
- optional<T>            -> nullable field
- timestamp (2004 epoch) -> TimestampType, truncated to seconds
- fixed-point 1e-7 lat/lon int32 -> IntegerType (divide by 1e7 at sink only)
- nwr/status enums       -> StringType labels
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = False) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# users: types.hpp:29-36, cols types.cpp:5
USERS = T.StructType(
    [
        _f("id", T.LongType()),
        _f("display_name", T.StringType()),
        _f("data_public", T.BooleanType()),
    ]
)

# changesets: types.hpp:79-95, cols types.cpp:6; sort key (id)
CHANGESETS = T.StructType(
    [
        _f("id", T.LongType()),
        _f("user_id", T.IntegerType()),
        _f("created_at", T.TimestampType()),
        _f("min_lat", T.IntegerType(), True),
        _f("max_lat", T.IntegerType(), True),
        _f("min_lon", T.IntegerType(), True),
        _f("max_lon", T.IntegerType(), True),
        _f("closed_at", T.TimestampType()),
        _f("num_changes", T.IntegerType()),
    ]
)

# changeset_tags: current_tag types.hpp:45-51, cols types.cpp:7
# (id column is positional '*' in the COPY header); sort key (element_id, k)
CHANGESET_TAGS = T.StructType(
    [
        _f("changeset_id", T.LongType()),
        _f("k", T.StringType()),
        _f("v", T.StringType()),
    ]
)

# node_tags / way_tags / relation_tags: old_tag types.hpp:110-116, cols
# types.cpp:8; sort key (element_id, version, k) -- k compared as unsigned
# UTF-8 bytes (extract_kv.cpp:73-91, dump_reader.cpp:379-390), which is
# exactly Spark's string ordering.
OLD_TAGS = T.StructType(
    [
        _f("element_id", T.LongType()),
        _f("version", T.LongType()),
        _f("k", T.StringType()),
        _f("v", T.StringType()),
    ]
)

# nodes: types.hpp:126-141, cols types.cpp:9; sort key (id, version)
NODES = T.StructType(
    [
        _f("node_id", T.LongType()),
        _f("version", T.LongType()),
        _f("changeset_id", T.LongType()),
        _f("visible", T.BooleanType()),
        _f("timestamp", T.TimestampType()),
        _f("redaction_id", T.LongType(), True),
        _f("latitude", T.IntegerType()),
        _f("longitude", T.IntegerType()),
    ]
)

# ways: types.hpp:170-184, cols types.cpp:10
WAYS = T.StructType(
    [
        _f("way_id", T.LongType()),
        _f("version", T.LongType()),
        _f("changeset_id", T.LongType()),
        _f("visible", T.BooleanType()),
        _f("timestamp", T.TimestampType()),
        _f("redaction_id", T.LongType(), True),
    ]
)

# way_nodes: types.hpp:155-160, cols types.cpp:11; sort key
# (way_id, version, sequence_id)
WAY_NODES = T.StructType(
    [
        _f("way_id", T.LongType()),
        _f("version", T.LongType()),
        _f("sequence_id", T.LongType()),
        _f("node_id", T.LongType()),
    ]
)

# relations: types.hpp:216-230, cols types.cpp:12
RELATIONS = T.StructType(
    [
        _f("relation_id", T.LongType()),
        _f("version", T.LongType()),
        _f("changeset_id", T.LongType()),
        _f("visible", T.BooleanType()),
        _f("timestamp", T.TimestampType()),
        _f("redaction_id", T.LongType(), True),
    ]
)

# relation_members: types.hpp:196-204, cols types.cpp:13; member_type is the
# nwr enum 'Node'|'Way'|'Relation' (unescape_copy_row.hpp:197-209)
RELATION_MEMBERS = T.StructType(
    [
        _f("relation_id", T.LongType()),
        _f("version", T.LongType()),
        _f("sequence_id", T.LongType()),
        _f("member_type", T.StringType()),
        _f("member_id", T.LongType()),
        _f("member_role", T.StringType()),
    ]
)

# changeset_comments: types.hpp:60-77, cols types.cpp:14; the Fusion
# adaptation order puts created_at second (types.hpp:70-77), so the sort key
# is (changeset_id, created_at).
CHANGESET_COMMENTS = T.StructType(
    [
        _f("changeset_id", T.LongType()),
        _f("created_at", T.TimestampType()),
        _f("author_id", T.LongType()),
        _f("body", T.StringType()),
        _f("visible", T.BooleanType()),
    ]
)

#: table name -> (schema, sort key columns).  Sort keys are the reference's
#: num_keys prefixes (include/types.hpp) — the order every downstream
#: sort-merge join and sink relies on.
TABLES: dict[str, tuple[T.StructType, tuple[str, ...]]] = {
    "users": (USERS, ("id",)),
    "changesets": (CHANGESETS, ("id",)),
    "changeset_tags": (CHANGESET_TAGS, ("changeset_id", "k")),
    "node_tags": (OLD_TAGS, ("element_id", "version", "k")),
    "way_tags": (OLD_TAGS, ("element_id", "version", "k")),
    "relation_tags": (OLD_TAGS, ("element_id", "version", "k")),
    "nodes": (NODES, ("node_id", "version")),
    "ways": (WAYS, ("way_id", "version")),
    "way_nodes": (WAY_NODES, ("way_id", "version", "sequence_id")),
    "relations": (RELATIONS, ("relation_id", "version")),
    "relation_members": (RELATION_MEMBERS, ("relation_id", "version", "sequence_id")),
    "changeset_comments": (CHANGESET_COMMENTS, ("changeset_id", "created_at")),
}

#: id column name per element table (the dump names them <type>_id,
#: the model calls them id — FIXTURES.md).
ID_COLUMN = {"nodes": "node_id", "ways": "way_id", "relations": "relation_id"}
