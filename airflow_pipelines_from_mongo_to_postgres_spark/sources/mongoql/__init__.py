"""MongoDB aggregation-pipeline → DataFrame translator.

The reference embeds hand-written aggregation pipelines per collection
(ref dags/includes/loanapplication_table.py:26-49: ``$match`` with a
``$gt`` datetime bound, ``$unwind {path}``, dotted-path ``$project``).
``apply_pipeline`` lets those pipeline definitions run verbatim against
a DataFrame — the drop-in path for a reference user whose collection is
already in the lake (parquet/CSV export) rather than behind a live
connector. For the live path, the SAME list serializes into the Spark
connector's server-side ``aggregation.pipeline`` option
(connectors.mongo_read_options), so one definition serves both.

Every stage translates to declarative DataFrame ops (Catalyst prunes and
pushes down through them); nothing collects, nothing loops rows.

Supported stages — the reference's three, plus the common tail:
``$match`` (equality, ``$eq/$ne/$gt/$gte/$lt/$lte/$in/$nin/$exists``,
``$and/$or``), ``$project`` (include / exclude / "$path" aliases),
``$unwind`` (str or ``{path, preserveNullAndEmptyArrays,
includeArrayIndex}``),
``$addFields``/``$set``, ``$group`` (``$sum/$avg/$min/$max/$count``,
``$sum: 1``, ``$push``/``$addToSet`` (sorted for determinism),
``$first``/``$last`` (upstream order via min_by/max_by),
``$stdDevPop/$stdDevSamp``, ``$median/$percentile`` (exact — inside
every t-digest error envelope, the documented contract),
``$mergeObjects`` (per-field last-non-null in document order; SQL NULL
counts as missing — rectangular deviation, r14),
the rank family ``$top/$bottom/$topN/$bottomN/$minN/$maxN/$firstN/
$lastN`` with a uniform deterministic tie contract (see
:func:`_topn_agg`); a ``$sort`` immediately before a ``$group`` whose
accumulators are order-sensitive ABSORBS into them inside correlated
``$lookup`` sub-pipelines (r15 — see :func:`_group`); mid-pipeline
``$sort``/``$skip``/``$limit`` runs in those sub-pipelines lower to
per-key ranking windows with the order carried into the pack;
non-terminal ``$group`` and ``$count``/``$sortByCount``/``$bucket``/
``$sample``/``$bucketAuto`` anywhere in them lower to per-document
forms over the join keys (r15 — see ``lookup._lower_mid_sort_limit``,
``lookup._rewrite_mid_sugar``, ``lookup._augment_partitions``)),
``$sort``, ``$limit``, ``$skip``,
``$count``, ``$unset``, ``$sample``, ``$redact`` (schema-recursive
KEEP/PRUNE/DESCEND), ``$facet`` (shared-scan
multi-aggregation), ``$bucket``/``$bucketAuto`` (incl. ``granularity``
preferred-number rounding), ``$setWindowFields`` (documents/range
frames incl. time AND calendar units; rank family, ``$shift``,
``$locf/$linearFill``, ``$derivative``/``$integral``,
``$expMovingAvg`` (exact per-partition sequential fold)),
``$fill`` (value/locf/linear), ``$densify``
(numeric + calendar grids), ``$graphLookup`` (per-depth-level BFS
joins), ``$geoNear`` (haversine lowering, index-free: GeoJSON meters /
legacy radians / flat — see ``_geo_near``), and the terminal write
stages ``$merge``/``$out`` (lowered
onto the snapshot table-format commits — see ``_write_stage``) — plus
the aggregation EXPRESSION language in computed values (``$project``
computed fields, ``$addFields``, ``$group`` accumulator arguments):
``$cond``/``$switch``, ``$ifNull``, ``$concat``, ``$min/$max``
(expression forms: element-wise over operand lists / reduce over a
single array operand, nulls ignored — r15),
``$add/$subtract/$multiply/$divide/$mod/$abs/$floor/$ceil/$round/
$trunc/$sqrt/$pow/$ln/$log/$log10/$exp`` + the trig/angle family
(``$sin..$atan2``, ``$degreesToRadians/$radiansToDegrees``), ``$toUpper/$toLower/$substrCP/$strLenCP/$substrBytes/$strLenBytes/
$split/$trim/$ltrim/$rtrim (chars honored, Mongo's wide default
whitespace set, r14)/$regexMatch/$regexFind/
$regexFindAll/$indexOfCP (incl. range form)/$indexOfBytes/$binarySize/
$replaceOne/$replaceAll``, array ops ``$size/$arrayElemAt/$in/$first/$last/$slice/
$range/$concatArrays/$reverseArray/$indexOfArray/$setUnion/
$setIntersection/$setDifference/$allElementsTrue/$anyElementTrue/
$sortArray/$zip``, object ops ``$getField/$setField/$objectToArray/
$arrayToObject`` (map columns), ``$cmp/$strcasecmp/$rand/$convert``,
``$bitAnd/$bitOr/$bitXor/$bitNot`` (Mongo 6.3 bitwise, empty-array
identities), ``$type/$isNumber/$isArray`` (BSON type introspection;
also the ``$match`` query operator ``$type`` with names/codes/'number',
r14),
higher-order functions ``$map/$filter/$reduce`` and ``$let`` with
``$$var`` scoping (Spark lambda functions — codegen, never Python),
``$$ROOT``/``$$CURRENT`` bound per stage (the whole current document
as a struct — ``$push: "$$ROOT"``, ``$top output $$ROOT``,
``$replaceWith {wrapped: "$$ROOT"}``),
``$year/$month/$dayOfMonth/$hour/$minute/$second/$millisecond/
$dayOfWeek/$isoDayOfWeek/$dayOfYear/$week (Sunday-based)/$isoWeek/
$isoWeekYear/$dateToString (incl. computed week specifiers
%w %u %U %V %G; onNull)/$dateFromString (onError/onNull)/
$dateFromParts (out-of-range parts CARRY, Mongo's additive rule, r14)/
$dateToParts``,
date math ``$dateAdd/$dateSubtract/$dateDiff`` (boundary-crossing
semantics; unit=week with startOfWeek, default Sunday)
``/$dateTrunc (startOfWeek)/$toDate`` — numbers are MILLIS since the
epoch (Mongo's rule, r14) — and EVERY date operator and part getter
accepts Mongo's ``timezone`` option (string-literal Olson names or
fixed offsets; part getters take the ``{date, timezone}`` long form;
zoned truncation returns the zone-boundary UTC instant; $dateAdd does
calendar arithmetic in the zone for day-or-larger units, r14),
``$toInt/$toLong/$toDouble/$toString/$toBool``, expression-form
``$eq/$ne/$gt/$gte/$lt/$lte`` and ``$and/$or/$not``, nested
arbitrarily.

Mongo-fidelity notes:
* dotted ``$project`` includes PRESERVE the nested document shape, as
  Mongo does ({'a.b': 1} outputs {a: {b: ...}}, null when the parent is
  null/missing) — so the conform layer's nested-path flatten specs run
  unchanged on pipeline output, and the reference's per-collection
  pipeline definitions compose with plans/pipeline.py end to end;
* ``$unwind`` defaults to dropping null/empty arrays, as Mongo does
  (preserveNullAndEmptyArrays=True maps to ``explode_outer``);
* ``$skip`` uses DataFrame.offset — meaningful only after a ``$sort``,
  same as Mongo.

Unsupported stages (REFUSED BY DESIGN, uniform error): Atlas-managed
and server-introspection stages raise :class:`UnsupportedMongoStage`
naming the reason and the in-repo alternative — see
:data:`UNSUPPORTED_STAGES` for the full stage → reason table
(Atlas ``$search``/``$searchMeta``, ``$changeStream``,
``$collStats``-family introspection — ``$vectorSearch`` is IMPLEMENTED
since r17 as full-scan ENN / deterministic-LSH ANN with
``{$meta: "vectorSearchScore"}`` support, ``stages._vector_search``);
refused
EXPRESSION operators (server-side JavaScript, BSON-internal types)
raise the same way — see :data:`UNSUPPORTED_EXPR_OPS`. A
whole-collection window (``$setWindowFields``/``$fill``/``$densify``
without ``partitionBy``) is Mongo-correct but plans a one-task stage —
it warns by default; set session conf
``spark.mongoql.strictWholeCollectionWindow=true`` to raise instead.

Package layout (r15 — split from the single 4.4k-line module; this
``__init__`` is an exact-parity facade, every name importable from
``...sources.mongoql`` exactly as before):

* ``errors``  — :class:`UnsupportedMongoStage`, the refusal tables
  :data:`UNSUPPORTED_STAGES` / :data:`UNSUPPORTED_EXPR_OPS`
* ``expr``    — the expression compiler (``_expr``/``_expr_op``), $$var
  environments, date/timezone machinery, the sort comparator
* ``match``   — the $match query-operator compiler
* ``windows`` — $setWindowFields and friends
* ``lookup``  — correlated $lookup decompilation + $graphLookup
* ``writes``  — $merge/$out lowering incl. the jdbc SET-clause compiler
* ``geo``     — $geoNear haversine lowering
* ``stages``  — the dispatcher ``apply_pipeline`` + remaining stages
"""

# Exact-parity facade: re-export EVERY top-level name (public and
# private) from the submodules so pre-split imports — including tests
# poking translator internals — keep working unchanged. Explicit
# re-exports would silently drift as helpers move; copying the
# submodule namespaces cannot. Submodule names were globally unique
# before the split, so there are no collisions to resolve.
import sys as _sys

from airflow_pipelines_from_mongo_to_postgres_spark.sources.mongoql import (  # noqa: F401
    errors,
    expr,
    geo,
    lookup,
    match,
    stages,
    windows,
    writes,
)

_this = _sys.modules[__name__]
for _m in (errors, expr, match, windows, geo, lookup, writes, stages):
    for _k, _v in vars(_m).items():
        if not _k.startswith("__") and not hasattr(_this, _k):
            setattr(_this, _k, _v)
del _m, _k, _v, _this, _sys
