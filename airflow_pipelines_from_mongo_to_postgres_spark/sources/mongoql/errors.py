"""Refusal tables for the Mongo translator: the error type and the
stage/expression-operator tables everything else raises from.
Split from the monolithic sources/mongoql.py in r15; see the
package docstring (``sources/mongoql/__init__.py``) for the full
supported-language surface."""

from __future__ import annotations


class UnsupportedMongoStage(ValueError):
    """Raised for aggregation stages this translator refuses BY DESIGN
    (see :data:`UNSUPPORTED_STAGES` for the stage → reason table).
    Subclasses ``ValueError`` so callers' existing error handling
    keeps working."""


#: Stages the translator refuses by design, with the reason and the
#: in-repo alternative. Everything else in the Mongo 7.0 aggregation
#: surface is implemented (module docstring above). A stage absent
#: from BOTH the dispatcher and this table is simply unknown and
#: raises a plain ValueError.
UNSUPPORTED_STAGES: dict[str, str] = {
    "$search": (
        "Atlas Search is a managed Lucene service, not part of the "
        "core aggregation language; use functions/text.py scoring or "
        "plans/llmdata.py BM25 retrieval"),
    "$searchMeta": (
        "Atlas Search metadata — same as $search; count facets with "
        "$group/$facet instead"),
    "$changeStream": (
        "change streams are a replication-protocol cursor, not a "
        "batch stage; the streaming equivalent is "
        "streaming/incremental.py (snapfeed CDC source)"),
    "$changeStreamSplitLargeEvent": (
        "change-stream helper — see $changeStream"),
    "$collStats": "server introspection has no meaning off-server",
    "$indexStats": "server introspection has no meaning off-server",
    "$planCacheStats": "server introspection has no meaning off-server",
    "$currentOp": "server introspection has no meaning off-server",
    "$listLocalSessions": "server introspection has no meaning off-server",
    "$listSessions": "server introspection has no meaning off-server",
    "$queryStats": "server introspection has no meaning off-server",
    "$shardedDataDistribution": (
        "sharding introspection has no meaning off-server"),
}

#: Expression operators refused BY DESIGN (the expression-language
#: analogue of :data:`UNSUPPORTED_STAGES`): each entry names the
#: reason and the in-repo alternative. Anything absent from both the
#: dispatcher and this table is simply unknown.
UNSUPPORTED_EXPR_OPS: dict[str, str] = {
    "$function": (
        "server-side JavaScript has no sandbox here; write the logic "
        "as expression operators (the full HOF/$let language is "
        "supported) or as a DataFrame transformation"),
    "$accumulator": (
        "server-side JavaScript accumulator — use the built-in "
        "accumulators or a two-stage $group + expression rewrite"),
    "$where": (
        "server-side JavaScript predicate — use $expr with the "
        "expression language"),
    "$toObjectId": (
        "there is no ObjectId type off-server; keep _id values as "
        "strings (string equality and sort order are preserved)"),
    "$tsSecond": (
        "BSON internal replication Timestamp type does not occur in "
        "parquet/JDBC data; use date expressions on real timestamps"),
    "$tsIncrement": (
        "BSON internal replication Timestamp type does not occur in "
        "parquet/JDBC data; use date expressions on real timestamps"),
    "$meta": (
        "query-execution metadata (textScore/indexKey) needs a server "
        "query planner; BM25 scoring lives in plans/llmdata.py. The "
        "one supported form is {$meta: 'vectorSearchScore'} in a "
        "pipeline that starts with $vectorSearch (r17)"),
}
