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
``$lookup`` sub-pipelines (r15 — see :func:`_group`)),
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
``$cond``/``$switch``, ``$ifNull``, ``$concat``,
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
(Atlas ``$search``/``$searchMeta``/``$vectorSearch``,
``$changeStream``, ``$collStats``-family introspection); refused
EXPRESSION operators (server-side JavaScript, BSON-internal types)
raise the same way — see :data:`UNSUPPORTED_EXPR_OPS`. A
whole-collection window (``$setWindowFields``/``$fill``/``$densify``
without ``partitionBy``) is Mongo-correct but plans a one-task stage —
it warns by default; set session conf
``spark.mongoql.strictWholeCollectionWindow=true`` to raise instead.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    "$vectorSearch": (
        "Atlas Vector Search is a managed ANN service; use "
        "operators/similarity.py (brute/LSH/IVF/PQ top-k)"),
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

_CMP = {"$eq": "__eq__", "$ne": "__ne__", "$gt": "__gt__", "$gte": "__ge__",
        "$lt": "__lt__", "$lte": "__le__"}

#: Mongo's documented default $trim whitespace set (wider than SQL's
#: plain space): null, tab, LF, VT, FF, CR, space, and the Unicode
#: space separators Mongo lists.
_TRIM_DEFAULT_CHARS = (
    "\x00\t\n\x0b\x0c\r \u00a0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
    "\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000")

#: Mongo startOfWeek day name -> Spark dayofweek index (1=Sun..7=Sat).
_WEEK_START = {"sunday": 1, "monday": 2, "tuesday": 3, "wednesday": 4,
               "thursday": 5, "friday": 6, "saturday": 7}


def _tz_literal(arg: dict) -> str | None:
    """Extract a Mongo ``timezone`` option — an Olson name or a
    ``(+|-)HH[:mm]`` offset, required to be a string LITERAL (Mongo
    allows expressions; a data-driven zone can't be verified at
    compile time, so the translator refuses it — raise, never
    guess)."""
    tz = arg.get("timezone")
    if tz is None:
        return None
    if not isinstance(tz, str) or not tz:
        raise ValueError(
            f"timezone must be a non-empty string literal (Olson name "
            f"or (+|-)HH:mm offset), got {tz!r}")
    return tz


def _tz_in(col: Column, tz: str | None) -> Column:
    """UTC instant -> wall clock in ``tz`` (no-op without a zone).
    Mongo dates are UTC instants; every zoned date operation is
    'shift to the zone's wall clock, operate, shift back'."""
    return F.from_utc_timestamp(col, tz) if tz else col


def _tz_out(col: Column, tz: str | None) -> Column:
    """Wall clock in ``tz`` -> UTC instant (no-op without a zone)."""
    return F.to_utc_timestamp(col, tz) if tz else col


def _date_operand(arg: Any, env: dict | None) -> Column:
    """Unwrap a date-part getter's operand: Mongo's long form
    ``{date: <expr>, timezone: <tz>}`` yields the date SHIFTED into
    the zone's wall clock (so the plain getter math is zone-correct);
    anything else evaluates as a bare expression."""
    if isinstance(arg, dict) and "date" in arg \
            and set(arg) <= {"date", "timezone"}:
        return _tz_in(_expr(arg["date"], env), _tz_literal(arg))
    return _expr(arg, env)


def _week_start_idx(name: Any) -> int:
    """Resolve a Mongo ``startOfWeek`` (full day name or 3-letter
    abbreviation, case-insensitive — Mongo's accepted forms) to
    Spark's ``dayofweek`` index. Raises on anything else (a typo'd
    day silently defaulting would shift every week boundary)."""
    if isinstance(name, str):
        low = name.lower()
        for full, idx in _WEEK_START.items():
            if low == full or low == full[:3]:
                return idx
    raise ValueError(f"invalid startOfWeek: {name!r} (day name or "
                     "3-letter abbreviation)")


def _ref(v: Any, env: dict | None = None) -> Column:
    """'$a.b' → column reference; '$$var[.path]' → a bound HOF/$let
    variable from ``env`` (with struct-field access on the tail);
    anything else → literal."""
    if isinstance(v, str) and v.startswith("$$"):
        name, _, rest = v[2:].partition(".")
        if name in ("ROOT", "CURRENT") and not (env and name in env):
            raise ValueError(
                f"$${name} is not bound in this expression context "
                "(stage-level $group/$project/$addFields/$match-$expr/"
                "$replaceRoot/$setWindowFields bind it); reference "
                "fields directly ('$field') here")
        if not env or name not in env:
            raise ValueError(f"unknown pipeline variable: $${name}")
        col = env[name]
        for part in (rest.split(".") if rest else []):
            col = col[part]
        return col
    if isinstance(v, str) and v.startswith("$"):
        return F.col(v[1:])
    return F.lit(v)


def _regex_is_context_free(pat: str) -> bool:
    """True when every match of ``pat`` is determined by the matched
    text alone — no lookaround, no anchors, no word boundaries, no
    backreferences — so a substring re-search finds the same match
    sequence as the global matcher ($regexFindAll's idx position
    walk). Conservative by design: tokens inside character classes
    still disqualify (a false negative only omits idx; a false
    positive would mis-position it)."""
    import re as _re

    return not _re.search(
        r"""\(\?=      # lookahead
          | \(\?!      # negative lookahead
          | \(\?<[=!]  # lookbehind (NOT named groups '(?<name>')
          | (?<!\\)(?:\\\\)*(?<!\[)\^   # unescaped ^ (not class negation)
          | (?<!\\)(?:\\\\)*\$          # unescaped $
          | \\[bBAzZG] # word/text boundaries
          | \\[1-9]    # backreferences
          | \\k<       # named backreferences
        """, pat, _re.VERBOSE)


def _expr(v: Any, env: dict | None = None) -> Column:
    """Aggregation EXPRESSION evaluator — the value language of
    ``$project`` computed fields, ``$addFields``/``$set`` and ``$group``
    accumulator arguments: field refs ('$a.b'), literals, and operator
    documents ({$cond}, {$ifNull}, {$concat}, arithmetic, expression
    comparisons, boolean combinators, array higher-order functions,
    date math), recursively. ``env`` carries lexically-scoped variable
    bindings ('$$x') introduced by $map/$filter/$reduce/$let — each
    binds Spark lambda variables, so HOF pipelines stay inside
    whole-stage codegen like the rest of the translator. An unknown
    $-operator raises ValueError (the translator's declared error
    class). A document whose keys carry NO $-prefix is Mongo's
    DOCUMENT LITERAL ({x: "$a", y: 1} in $project/$addFields) —
    a struct whose field values are themselves expressions; a
    multi-key document that MIXES $-keys with plain keys is rejected
    rather than guessed at."""
    if isinstance(v, dict):
        if len(v) == 1 and next(iter(v)).startswith("$"):
            (op, arg), = v.items()
            return _expr_op(op, arg, env)
        if v and not any(k.startswith("$") for k in v):
            return F.struct(*[_expr(x, env).alias(k)
                              for k, x in v.items()])
        raise ValueError(
            f"unsupported expression document: {v!r} (operator documents "
            "have exactly one $-key; document literals have none)")
    return _ref(v, env)


def _expr_op(op: str, arg: Any, env: dict | None = None) -> Column:
    def args(n: int | None = None) -> list[Column]:
        if not isinstance(arg, list) or (n is not None and len(arg) != n):
            raise ValueError(
                f"{op} expects an array of {n if n else '>=1'} operands")
        if not arg:
            raise ValueError(f"{op} expects a non-empty operand array")
        return [_expr(x, env) for x in arg]

    def fold(cols, f):
        acc = cols[0]
        for c in cols[1:]:
            acc = f(acc, c)
        return acc

    if op == "$literal":
        return F.lit(arg)
    if op == "$cond":
        if isinstance(arg, dict):
            i, t, e = arg["if"], arg["then"], arg["else"]
        elif isinstance(arg, list) and len(arg) == 3:
            i, t, e = arg
        else:
            raise ValueError("$cond expects [if, then, else] or "
                             "{if, then, else}")
        return F.when(_expr(i, env), _expr(t, env)).otherwise(_expr(e, env))
    if op == "$ifNull":
        cols = args()
        if len(cols) < 2:
            raise ValueError("$ifNull expects at least 2 operands")
        return F.coalesce(*cols)
    if op == "$concat":
        return F.concat(*args())       # null-if-any-null, Mongo's rule
    if op == "$add":
        return fold(args(), lambda a, b: a + b)
    if op == "$multiply":
        return fold(args(), lambda a, b: a * b)
    if op == "$subtract":
        a, b = args(2)
        return a - b
    if op == "$divide":
        a, b = args(2)
        return a / b
    if op == "$mod":
        a, b = args(2)
        return a % b                   # dividend sign, Mongo/C semantics
    if op == "$abs":
        return F.abs(_expr(arg, env))
    if op == "$toUpper":
        return F.upper(_expr(arg, env))
    if op == "$toLower":
        return F.lower(_expr(arg, env))
    if op in _CMP:                     # expression-form comparison
        a, b = args(2)
        return getattr(a, _CMP[op])(b)
    if op == "$and":
        return fold(args(), lambda a, b: a & b)
    if op == "$or":
        return fold(args(), lambda a, b: a | b)
    if op == "$not":
        inner = arg[0] if isinstance(arg, list) and len(arg) == 1 else arg
        return ~_expr(inner, env)
    if op == "$switch":
        if not isinstance(arg, dict) or "branches" not in arg:
            raise ValueError("$switch expects {branches: [...], default}")
        col = None
        for br in arg["branches"]:
            w = F.when(_expr(br["case"], env), _expr(br["then"], env))
            col = w if col is None else col.when(_expr(br["case"], env),
                                                 _expr(br["then"], env))
        if col is None:
            raise ValueError("$switch needs at least one branch")
        return col.otherwise(_expr(arg["default"], env)) if "default" in arg \
            else col
    # strings (codepoint semantics match Spark's character functions)
    if op == "$substrCP":
        s, start, length = args(3)
        return F.substring(s, start + F.lit(1), length)  # 0- -> 1-indexed
    if op == "$strLenCP":
        return F.length(_expr(arg, env))
    if op == "$strLenBytes":
        # UTF-8 byte length (octet_length), vs $strLenCP's code points
        return F.octet_length(_expr(arg, env))
    if op in ("$substrBytes", "$substr"):
        # byte-indexed substring ($substr is Mongo's deprecated alias).
        # Deviation, documented: slicing through the middle of a
        # multi-byte UTF-8 character yields replacement characters
        # where Mongo errors — binary substring has no validity check.
        s, start, length = args(3)
        return F.substring(s.cast("binary"), start + F.lit(1), length) \
            .cast("string")
    if op == "$split":
        s, delim = args(2)
        # Mongo splits on a LITERAL delimiter; split() takes a regex —
        # a field-ref delimiter ('$col') can't be regex-escaped per row
        if not (isinstance(arg, list) and isinstance(arg[1], str)
                and not arg[1].startswith("$")):
            raise ValueError("$split delimiter must be a string literal")
        import re as _re
        return F.split(s, _re.escape(arg[1]))
    if op in ("$trim", "$ltrim", "$rtrim"):
        # chars honored (r14 — previously silently ignored); the
        # default set is Mongo's documented whitespace list, wider
        # than Spark's plain-space default
        fn = {"$trim": F.trim, "$ltrim": F.ltrim, "$rtrim": F.rtrim}[op]
        inp = _expr(arg["input"] if isinstance(arg, dict) else arg, env)
        chars = (_expr(arg["chars"], env)
                 if isinstance(arg, dict) and "chars" in arg
                 else F.lit(_TRIM_DEFAULT_CHARS))
        return fn(inp, chars)
    # arrays
    if op == "$size":
        return F.size(_expr(arg, env))
    if op == "$arrayElemAt":
        a, idx = args(2)
        # Mongo: 0-indexed, negative from the end, out-of-range -> missing.
        # element_at is 1-indexed and ANSI-errors out of range; get() is
        # 0-indexed and null-safe but positive-only — branch on sign.
        n = F.size(a)
        return F.when(idx >= 0, F.get(a, idx)).otherwise(F.get(a, n + idx))
    if op == "$in":
        v, array = args(2)
        return F.array_contains(array, v)
    # dates — every part getter accepts Mongo's long form
    # {date, timezone} (r14): the operand arrives pre-shifted into the
    # zone's wall clock, so the part math below is zone-correct as-is
    if op in ("$year", "$month", "$dayOfMonth", "$hour", "$minute",
              "$second"):
        fn = {"$year": F.year, "$month": F.month,
              "$dayOfMonth": F.dayofmonth, "$hour": F.hour,
              "$minute": F.minute, "$second": F.second}[op]
        return fn(_date_operand(arg, env))
    if op == "$dayOfWeek":       # 1 = Sunday .. 7 = Saturday, both engines
        return F.dayofweek(_date_operand(arg, env))
    if op == "$isoDayOfWeek":    # 1 = Monday .. 7 = Sunday
        return ((F.dayofweek(_date_operand(arg, env)) + 5) % 7) + 1
    if op == "$dayOfYear":
        return F.dayofyear(_date_operand(arg, env))
    if op == "$isoWeek":         # Spark's weekofyear IS the ISO week
        return F.weekofyear(_date_operand(arg, env))
    if op == "$week":
        # Mongo's Sunday-based week-of-year: week 1 begins at the
        # first Sunday; earlier days are week 0. Closed form, no
        # branch: floor((dayOfYear + 6 - daysSinceSunday) / 7), where
        # daysSinceSunday = dayofweek - 1 (Spark: 1=Sunday..7=Saturday)
        d = _date_operand(arg, env)
        return F.floor(
            (F.dayofyear(d) + 6 - (F.dayofweek(d) - 1)) / 7).cast("int")
    if op == "$isoWeekYear":
        # ISO week-numbering year = calendar year of that week's
        # THURSDAY (the classic trick — no extract(YEAROFWEEK) needed,
        # stays a plain column expression): shift the date to its ISO
        # Thursday (iso_dow 4) and take the year
        d = _date_operand(arg, env).cast("date")
        iso_dow = ((F.dayofweek(d) + 5) % 7) + 1
        return F.year(F.date_add(d, (F.lit(4) - iso_dow).cast("int")))
    if op == "$millisecond":
        return F.date_format(_date_operand(arg, env), "SSS").cast("int")
    if op == "$dateFromParts":
        if isinstance(arg, dict) and "isoWeekYear" in arg:
            raise ValueError("$dateFromParts ISO-week form is "
                             "unsupported — use the calendar parts")
        if not isinstance(arg, dict) or "year" not in arg:
            raise ValueError("$dateFromParts expects {year[, month, day, "
                             "hour, minute, second, millisecond]}")
        def part(name, default):
            return (_expr(arg[name], env) if name in arg
                    else F.lit(default))
        # Mongo CARRIES out-of-range parts (month 14 -> next February,
        # day 0 -> last day of the previous month, hour 25 -> next
        # day): build year-01-01 00:00 and ADD each part as an offset —
        # the additive chain is exactly Mongo's carry rule (each part
        # offsets the date the larger parts produced), where
        # make_timestamp would raise. r14: closes the documented
        # carry deviation; only year must be in range (Mongo: 1-9999).
        ts = F.make_timestamp(
            part("year", 0).cast("int"), F.lit(1), F.lit(1),
            F.lit(0), F.lit(0), F.lit(0.0))
        ts = F.timestamp_add("month",
                             (part("month", 1) - 1).cast("int"), ts)
        ts = F.timestamp_add("day", (part("day", 1) - 1).cast("int"), ts)
        ts = F.timestamp_add("hour", part("hour", 0).cast("int"), ts)
        ts = F.timestamp_add("minute", part("minute", 0).cast("int"), ts)
        us = (part("second", 0).cast("double") * 1_000_000.0
              + part("millisecond", 0).cast("double") * 1_000.0)
        ts = F.timestamp_add("microsecond",
                             F.round(us, 0).cast("long"), ts)
        # the parts describe a WALL CLOCK in `timezone` (r14) — shift
        # the built timestamp back to the UTC instant Mongo stores
        return _tz_out(ts, _tz_literal(arg))
    if op == "$dateToParts":
        if not isinstance(arg, dict) or "date" not in arg:
            raise ValueError("$dateToParts expects {date}")
        if arg.get("iso8601"):
            d = _tz_in(_expr(arg["date"], env), _tz_literal(arg))
            iso_dow = ((F.dayofweek(d) + 5) % 7) + 1
            thu = F.date_add(d.cast("date"),
                             (F.lit(4) - iso_dow).cast("int"))
            return F.struct(
                F.year(thu).alias("isoWeekYear"),
                F.weekofyear(d).alias("isoWeek"),
                iso_dow.alias("isoDayOfWeek"),
                F.hour(d).alias("hour"), F.minute(d).alias("minute"),
                F.second(d).alias("second"),
                F.date_format(d, "SSS").cast("int").alias("millisecond"))
        d = _tz_in(_expr(arg["date"], env), _tz_literal(arg))
        return F.struct(
            F.year(d).alias("year"), F.month(d).alias("month"),
            F.dayofmonth(d).alias("day"), F.hour(d).alias("hour"),
            F.minute(d).alias("minute"), F.second(d).alias("second"),
            F.date_format(d, "SSS").cast("int").alias("millisecond"))
    if op == "$dateToString":
        if not isinstance(arg, dict) or "date" not in arg:
            raise ValueError("$dateToString expects {date, format}")
        fmt = arg.get("format", "%Y-%m-%dT%H:%M:%S.%LZ")
        raw = _expr(arg["date"], env)
        d = _tz_in(raw, _tz_literal(arg))

        def with_on_null(col: Column) -> Column:
            if "onNull" in arg:
                return F.when(raw.isNull(),
                              _expr(arg["onNull"], env)
                              .try_cast("string")).otherwise(col)
            return col

        if not any(s in fmt for s in _COMPUTED_SPECIFIERS):
            return with_on_null(F.date_format(d, _mongo_date_format(fmt)))
        # week-family specifiers have no SimpleDateFormat letter with
        # Mongo's semantics (Spark 3+ removed week patterns; %U is
        # Sunday-based) — split the format at them and concat plain
        # date_format segments with the computed parts (r14)
        pieces: list[Column] = []
        buf: list[str] = []

        def flush():
            if buf:
                pieces.append(
                    F.date_format(d, _mongo_date_format("".join(buf))))
                buf.clear()

        i = 0
        while i < len(fmt):
            if fmt[i] == "%":
                spec = fmt[i:i + 2]
                if spec in _COMPUTED_SPECIFIERS:
                    flush()
                    pieces.append(_computed_specifier(spec, d))
                else:
                    buf.append(spec)   # validated by _mongo_date_format
                i += 2
            else:
                buf.append(fmt[i])
                i += 1
        flush()
        return with_on_null(F.concat(*pieces))
    if op == "$dateFromString":
        if not isinstance(arg, dict) or "dateString" not in arg:
            raise ValueError("$dateFromString expects {dateString[, format]}")
        inp = _expr(arg["dateString"], env)
        soft = "onError" in arg      # unparseable -> onError, not abort
        fmt = (_mongo_date_format(arg["format"]) if "format" in arg
               else None)
        # API asymmetry: to_timestamp takes the pattern as a str;
        # try_to_timestamp takes ColumnOrName (a bare str would be
        # read as a COLUMN NAME) — pass each what it wants
        if fmt is not None:
            parsed = (F.try_to_timestamp(inp, F.lit(fmt)) if soft
                      else F.to_timestamp(inp, fmt))
        else:
            parsed = F.try_to_timestamp(inp) if soft \
                else F.to_timestamp(inp)
        # the string is a WALL CLOCK in `timezone` — shift to the UTC
        # instant (Mongo ignores the option when the string itself
        # carries an offset; formats here carry none, %z is not in
        # the specifier table)
        out = _tz_out(parsed, _tz_literal(arg))
        # fallbacks unify to TIMESTAMP (the $convert discipline —
        # Mongo returns them as-is, but a rectangular column needs
        # one type; try_cast keeps ANSI from re-aborting)
        if soft:
            out = F.when(inp.isNotNull() & out.isNull(),
                         _expr(arg["onError"], env).try_cast("timestamp")
                         ).otherwise(out)
        if "onNull" in arg:
            out = F.when(inp.isNull(),
                         _expr(arg["onNull"], env).try_cast("timestamp")
                         ).otherwise(out)
        return out
    # numeric
    if op == "$floor":
        return F.floor(_expr(arg, env))
    if op == "$ceil":
        return F.ceil(_expr(arg, env))
    if op == "$round":
        if isinstance(arg, list) and len(arg) == 2 \
                and isinstance(arg[1], int):
            return F.round(_expr(arg[0], env), arg[1])
        return F.round(_expr(arg[0] if isinstance(arg, list) else arg, env), 0)
    if op == "$sqrt":
        return F.sqrt(_expr(arg, env))
    if op == "$pow":
        a, b = args(2)
        return F.pow(a, b)
    if op == "$ln":
        return F.log(_expr(arg, env))
    if op == "$log10":
        return F.log10(_expr(arg, env))
    if op == "$log":
        a, b = args(2)        # [number, base]
        return F.log(a) / F.log(b)
    if op == "$exp":
        return F.exp(_expr(arg, env))
    if op == "$trunc":
        if isinstance(arg, list) and len(arg) == 2 \
                and isinstance(arg[1], int):
            # truncate toward zero at `place` decimal digits, in pure
            # double math: s - s % 1.0 drops the fraction with the
            # dividend's sign (Java %), so it never overflows the way
            # a long cast does for |x| > ~9.2e18/10^p — beyond 2^53
            # s % 1.0 is 0 and the value passes through, exactly
            # Mongo's double behavior
            scale = 10 ** arg[1]
            s = _expr(arg[0], env) * scale
            return (s - s % F.lit(1.0)) / F.lit(scale)
        x = _expr(arg[0] if isinstance(arg, list) else arg, env)
        return x.cast("long")
    _TRIG = {"$sin": F.sin, "$cos": F.cos, "$tan": F.tan,
             "$asin": F.asin, "$acos": F.acos, "$atan": F.atan,
             "$sinh": F.sinh, "$cosh": F.cosh, "$tanh": F.tanh,
             "$degreesToRadians": F.radians,
             "$radiansToDegrees": F.degrees}
    if op in _TRIG:
        return _TRIG[op](_expr(arg, env))
    if op == "$atan2":
        a, b = args(2)
        return F.atan2(a, b)
    # type conversion (Mongo $convert's common shorthands)
    if op in ("$toInt", "$toLong", "$toDouble", "$toString", "$toBool"):
        t = {"$toInt": "int", "$toLong": "long", "$toDouble": "double",
             "$toString": "string", "$toBool": "boolean"}[op]
        return _expr(arg, env).cast(t)
    if op == "$toDate":
        return _mongo_to_date(_expr(arg, env))
    # array higher-order functions — Spark lambda functions, so the
    # per-element logic runs inside codegen, never a Python UDF
    if op == "$map":
        var = arg.get("as", "this")
        return F.transform(
            _expr(arg["input"], env),
            lambda x: _expr(arg["in"], {**(env or {}), var: x}))
    if op == "$filter":
        var = arg.get("as", "this")
        out = F.filter(
            _expr(arg["input"], env),
            lambda x: _expr(arg["cond"], {**(env or {}), var: x}))
        if "limit" in arg:
            out = F.slice(out, 1, _expr(arg["limit"], env))
        return out
    if op == "$reduce":
        return F.aggregate(
            _expr(arg["input"], env), _expr(arg["initialValue"], env),
            lambda acc, x: _expr(arg["in"],
                                 {**(env or {}), "value": acc, "this": x}))
    if op == "$let":
        # Mongo resolves every vars expression against the OUTER scope
        # (a var shadowing an outer binding must not be visible to its
        # sibling vars — sequential scoping would silently change
        # results); only 'in' sees the new bindings
        bound = {name: _expr(vexpr, env)
                 for name, vexpr in arg["vars"].items()}
        return _expr(arg["in"], {**(env or {}), **bound})
    if op == "$range":
        ops = args()
        s, e = ops[0], ops[1]
        st = ops[2] if len(ops) == 3 else F.lit(1)
        # Mongo: end-EXCLUSIVE, and an unwalkable range (step 0 / wrong
        # sign / s == e) is EMPTY; Spark sequence is end-inclusive and
        # ERRORS on those — so substitute safe arguments when invalid
        # and let the element filter erase everything (single
        # expression, no typed-empty-array branch to coerce)
        valid = (st != 0) & (((e > s) & (st > 0)) | ((e < s) & (st < 0)))
        seq = F.sequence(F.when(valid, s).otherwise(F.lit(0)),
                         F.when(valid, e).otherwise(F.lit(0)),
                         F.when(valid, st).otherwise(F.lit(1)))
        return F.filter(seq, lambda x: valid &
                        F.when(st > 0, x < e).otherwise(x > e))
    if op == "$concatArrays":
        return F.concat(*args())
    if op == "$reverseArray":
        return F.reverse(_expr(arg, env))
    if op == "$indexOfArray":
        a, v = args(2)       # 0-based; -1 when absent (array_position+1)
        return (F.array_position(a, v) - 1).cast("int")
    if op == "$first":
        return F.get(_expr(arg, env), 0)
    if op == "$last":
        a = _expr(arg, env)
        return F.get(a, F.size(a) - 1)
    if op == "$slice":
        ops = args()
        if len(ops) == 2:
            a, n = ops
            # n >= 0: first n; n < 0: last n (Mongo's 2-arg form).
            # Mongo CLAMPS |n| to the array size; Spark's slice returns
            # [] when the negative start is out of range — clamp it,
            # and pin start to -1 for EMPTY arrays (start 0 is a Spark
            # runtime error; -1 on empty yields [], Mongo's answer)
            start = F.least(F.lit(-1), F.greatest(-F.size(a), n))
            return F.when(n >= 0, F.slice(a, 1, n)) \
                .otherwise(F.slice(a, start, -n))
        if len(ops) == 3:
            a, pos, n = ops
            # 3-arg: position may be negative (from the end), n > 0;
            # Spark's slice start is 1-based / negative-from-end too.
            # Mongo CLAMPS a negative position beyond the length to the
            # array start ({$slice: [[1,2,3], -10, 2]} -> [1,2]) where
            # Spark returns [] — clamp like the 2-arg branch, with the
            # same -1 pin so empty arrays never hit Spark's illegal
            # start-0 (and still yield [], Mongo's answer)
            neg = F.least(F.lit(-1), F.greatest(-F.size(a), pos))
            return F.slice(a, F.when(pos >= 0, pos + 1).otherwise(neg), n)
        raise ValueError("$slice expects [array, n] or [array, pos, n]")
    if op == "$mergeObjects":
        # expression form, the [struct, doc-literal...] subset: later
        # operands must be document literals, each field grafted with
        # withField (later fields overwrite — Mongo's rule). Covers the
        # classic $replaceWith {$mergeObjects: ["$$ROOT", {...}]}
        # idiom. Merging two OPAQUE struct columns needs runtime field
        # iteration Spark expressions don't have — raise. Deviation,
        # documented: a NULL base stays NULL (withField semantics);
        # Mongo ignores null operands.
        if not isinstance(arg, list) or not arg:
            raise ValueError("$mergeObjects expects a non-empty array")
        base = _expr(arg[0], env)
        for part in arg[1:]:
            if not isinstance(part, dict) \
                    or any(k.startswith("$") for k in part):
                raise ValueError(
                    "$mergeObjects operands after the first must be "
                    "document literals ({field: expr}) — merging two "
                    "opaque documents has no expression lowering")
            for k2, v2 in part.items():
                if "." in k2:
                    raise ValueError(
                        f"$mergeObjects nested path {k2!r} unsupported")
                base = base.withField(k2, _expr(v2, env))
        return base
    if op == "$sortArray":
        # scalar arrays (or whole-struct element order): sort_array
        # handles both; a sortBy DOCUMENT selecting specific fields /
        # mixed directions is not expressible in one expression — raise
        sb = arg["sortBy"]
        if isinstance(sb, dict):
            # doc-array sort ({field: ±1, ...}): array_sort with the
            # per-field asc/desc comparator (BSON null-first ordering,
            # whole-doc tiebreak) — the same machinery as the $lookup
            # terminal-$sort lowering, one JVM expression
            if not sb or any("." in f for f in sb):
                raise ValueError(
                    "$sortArray sortBy documents need non-empty "
                    "top-level field names (no dotted paths)")
            return F.array_sort(
                _expr(arg["input"], env),
                _lookup_sort_cmp({f: int(d) for f, d in sb.items()}))
        return F.sort_array(_expr(arg["input"], env), int(sb) == 1)
    if op == "$zip":
        inputs = arg["inputs"]
        if not isinstance(inputs, list) or len(inputs) < 2:
            raise ValueError("$zip needs an inputs list of 2+ arrays")
        arrs = [_expr(x, env) for x in inputs]
        if arg.get("useLongestLength"):
            # pad to the LONGEST input with the per-input defaults
            # (null without `defaults`, Mongo's rule): concat each
            # input with array_repeat(default, deficit) — genuine null
            # ELEMENTS inside the shorter array stay null, only
            # positions beyond its length take the default; no index
            # arithmetic, no ANSI out-of-bounds edge
            dflt = arg.get("defaults")
            if dflt is not None and (not isinstance(dflt, list)
                                     or len(dflt) != len(arrs)):
                raise ValueError(
                    "$zip defaults must list one value per input")
            ds = ([_expr(d, env) for d in dflt] if dflt
                  else [F.lit(None)] * len(arrs))
            n = F.greatest(*[F.size(a) for a in arrs])
            padded = [F.concat(a, F.array_repeat(d, n - F.size(a)))
                      for a, d in zip(arrs, ds)]
        else:
            # Mongo zips to the SHORTEST input; zip_with pads with
            # null — slice all to the common length first
            n = F.least(*[F.size(a) for a in arrs])
            padded = [F.slice(a, 1, n) for a in arrs]
        # arity 3+ (r14): left-fold binary zip_with, appending each
        # further input's element to the growing per-position array —
        # k-1 chained JVM lambda expressions, still one projection
        out = F.zip_with(padded[0], padded[1],
                         lambda x, y: F.array(x, y))
        for nxt in padded[2:]:
            out = F.zip_with(out, nxt,
                             lambda xs, y: F.concat(xs, F.array(y)))
        return out
    if op == "$cmp":
        # BSON total order ranks null/missing BELOW numbers/strings,
        # so $cmp(null, 1) is -1, not null
        a, b = args(2)
        return (F.when(a.isNull() & b.isNull(), 0)
                .when(a.isNull(), -1)
                .when(b.isNull(), 1)
                .when(a < b, -1).when(a > b, 1)
                .when(a == b, 0))
    if op == "$strcasecmp":
        # same BSON null ordering: null sorts below any string
        a, b = args(2)
        a, b = F.upper(a), F.upper(b)
        return (F.when(a.isNull() & b.isNull(), 0)
                .when(a.isNull(), -1)
                .when(b.isNull(), 1)
                .when(a < b, -1).when(a > b, 1)
                .when(a == b, 0))
    if op == "$rand":
        return F.rand()
    if op == "$getField":
        # static-name subset; bare-string form reads the current doc
        if isinstance(arg, str):
            return F.col(arg)
        fld = arg["field"]
        if not isinstance(fld, str):
            raise ValueError("$getField needs a literal field name")
        return _expr(arg["input"], env)[fld] if "input" in arg \
            else F.col(fld)
    if op == "$setField":
        fld = arg["field"]
        if not isinstance(fld, str):
            raise ValueError("$setField needs a literal field name")
        target = _expr(arg["input"], env)
        val = _expr(arg["value"], env)
        return target.withField(fld, val)
    if op == "$convert":
        to = arg["to"]
        types = {"int": "int", "long": "long", "double": "double",
                 "string": "string", "bool": "boolean",
                 "date": "timestamp", "decimal": "decimal(38,10)"}
        if to not in types:
            raise ValueError(f"unsupported $convert target: {to!r}")
        inp = _expr(arg["input"], env)
        if to == "date":
            # Mongo's number→date rule is millis-since-epoch, not the
            # SQL seconds cast (r14) — shared with $toDate
            cast = _mongo_to_date(inp, use_try="onError" in arg)
        elif "onError" in arg:
            cast = inp.try_cast(types[to])
        else:
            cast = inp.cast(types[to])
        out = cast
        # Deviation, documented: Mongo returns onError/onNull values
        # AS-IS (heterogeneous result); a rectangular engine must unify
        # the branch types, so both fallbacks are try_cast to the
        # TARGET type — otherwise Spark's CASE-WHEN coercion could pick
        # the FALLBACK's type and re-cast the converted input under
        # ANSI (fuzz-found: to:'string' + onError:-1 made the string
        # branch cast to BIGINT and abort on unparseable input)
        if "onError" in arg:
            # only a FAILED conversion takes onError — null input does
            # not count as an error in Mongo
            out = F.when(inp.isNotNull() & cast.isNull(),
                         _expr(arg["onError"], env).try_cast(types[to])
                         ).otherwise(cast)
        if "onNull" in arg:
            out = F.when(inp.isNull(),
                         _expr(arg["onNull"], env).try_cast(types[to])
                         ).otherwise(out)
        return out
    if op == "$objectToArray":
        # MAP columns: entries as {k, v} docs (Mongo's shape). Struct
        # columns have no runtime field iteration in one expression —
        # Spark's analyzer raises on the type mismatch with a clear
        # message, the documented contract.
        return F.transform(
            F.map_entries(_expr(arg, env)),
            lambda e: F.struct(e["key"].alias("k"),
                               e["value"].alias("v")))
    if op == "$arrayToObject":
        inner = arg[0] if isinstance(arg, list) and len(arg) == 1 else arg
        return F.map_from_entries(F.transform(
            _expr(inner, env),
            lambda e: F.struct(e["k"], e["v"])))
    if op in ("$setUnion", "$setIntersection", "$setDifference"):
        fn = {"$setUnion": F.array_union,
              "$setIntersection": F.array_intersect,
              "$setDifference": F.array_except}[op]
        # set semantics: deduped, order unspecified in Mongo — pinned
        # sorted (the translator's determinism convention)
        return F.sort_array(F.array_distinct(fold(args(), fn)))
    if op == "$allElementsTrue":
        inner = arg[0] if isinstance(arg, list) and len(arg) == 1 else arg
        return F.forall(_expr(inner, env), lambda x: x.cast("boolean"))
    if op == "$anyElementTrue":
        inner = arg[0] if isinstance(arg, list) and len(arg) == 1 else arg
        return F.exists(_expr(inner, env), lambda x: x.cast("boolean"))
    # strings (regex + search/replace)
    if op == "$regexMatch":
        pat = arg["regex"]
        if not isinstance(pat, str):
            raise ValueError("$regexMatch regex must be a string literal")
        opts = arg.get("options", "")
        if set(opts) - set("imsx"):
            raise ValueError(f"unsupported $regexMatch options: {opts!r}")
        if opts:
            pat = f"(?{opts}){pat}"
        # Java regex, not PCRE — the common subset is identical; exotic
        # PCRE constructs (recursion, \K) differ, documented deviation
        return _expr(arg["input"], env).rlike(pat)
    if op in ("$regexFind", "$regexFindAll"):
        import re as _re

        pat = arg["regex"]
        if not isinstance(pat, str):
            raise ValueError(f"{op} regex must be a string literal")
        opts = arg.get("options", "")
        if set(opts) - set("imsx"):
            raise ValueError(f"unsupported {op} options: {opts!r}")
        ngroups = _re.compile(pat).groups
        if opts:
            pat = f"(?{opts}){pat}"
        inp = _expr(arg["input"], env)
        # Deviation, documented: captures that matched EMPTY map to
        # null like unmatched ones (regexp_extract returns '' for both).
        caps = F.array(*[
            F.nullif(F.regexp_extract(inp, pat, i + 1), F.lit(""))
            for i in range(ngroups)]).cast("array<string>")
        if op == "$regexFind":
            pos = F.regexp_instr(inp, F.lit(pat))
            return F.when(pos > 0, F.struct(
                F.regexp_extract(inp, pat, 0).alias("match"),
                (pos - 1).cast("int").alias("idx"),
                caps.alias("captures")))
        # Mongo: a null/missing input finds NOTHING — empty array
        matches = F.coalesce(F.regexp_extract_all(inp, F.lit(pat), 0),
                             F.array().cast("array<string>"))
        # Per-match captures are extracted POSITIONALLY from the
        # ORIGINAL input — one aligned array per group,
        # regexp_extract_all(inp, pat, j+1) runs the same matcher loop
        # as the match array so lengths align — never by re-matching
        # the pattern against the isolated match text, which silently
        # rebinds or fails for context-dependent patterns
        # (lookaround/anchors/alternation — r13 ADVICE).
        garrs = [F.regexp_extract_all(inp, F.lit(pat), j + 1)
                 for j in range(ngroups)]

        def caps_at(i: Column) -> Column:
            if ngroups == 0:
                return F.array().cast("array<string>")
            return F.array(*[
                F.nullif(F.element_at(g, i + F.lit(1)), F.lit(""))
                for g in garrs]).cast("array<string>")

        if _regex_is_context_free(pat):
            # Per-match idx via a sequential position walk: each step
            # re-searches the REMAINDER of the input (substring from
            # the previous match's end), so the k-th hit's absolute
            # position is offset + relative regexp_instr. Sound only
            # for context-free patterns — the guard below — because a
            # substring search must find the same match sequence as
            # the global matcher. Zero-length matches advance by one,
            # the Java matcher's own rule, keeping the walk aligned
            # with regexp_extract_all. O(matches × remaining-length)
            # per row — the document-scan shapes this serves are
            # bounded by doc length, and the walk stays JVM-side
            # codegen (the JPEG-SOF aggregate() trick).
            walk = F.aggregate(
                matches,
                F.struct(F.lit(0).alias("off"),
                         F.array().cast("array<int>").alias("idxs")),
                lambda acc, m: F.struct(
                    (acc["off"]
                     + F.regexp_instr(
                         F.substring(inp, acc["off"] + 1, F.length(inp)),
                         F.lit(pat)) - 1
                     + F.greatest(F.length(m), F.lit(1))
                     ).cast("int").alias("off"),
                    F.concat(acc["idxs"], F.array(
                        (acc["off"] + F.regexp_instr(
                            F.substring(inp, acc["off"] + 1,
                                        F.length(inp)),
                            F.lit(pat)) - 1).cast("int"))).alias("idxs")))
            idxs = walk["idxs"]
            return F.transform(matches, lambda m, i: F.struct(
                m.alias("match"),
                F.element_at(idxs, i + F.lit(1)).alias("idx"),
                caps_at(i).alias("captures")))
        # Context-dependent pattern (lookaround/anchor/\b/backref): a
        # substring walk would mis-position matches whose context the
        # cut removed, so the struct omits idx — reading .idx fails
        # loudly at analysis, never silently (documented deviation).
        return F.transform(matches, lambda m, i: F.struct(
            m.alias("match"),
            caps_at(i).alias("captures")))
    if op == "$indexOfCP":
        ops = args()
        if len(ops) == 2:
            s, sub = ops          # 0-based; -1 when absent (instr's
            # 1-based 0-when-missing maps exactly under the -1 shift)
            return (F.call_function("instr", s, sub) - 1).cast("int")
        if len(ops) in (3, 4):
            # range form: search within [start, end) — locate() from
            # the 1-based start; an end bound truncates the haystack
            # so the match must lie FULLY inside the range (the
            # documented interpretation of Mongo's end index)
            s, sub = ops[0], ops[1]
            start = ops[2].cast("int")
            if len(ops) == 4:
                s = F.substring(s, 1, ops[3].cast("int"))
            pos = F.call_function("locate", sub, s, start + F.lit(1))
            return (pos - 1).cast("int")
    if op == "$indexOfBytes":
        ops = args()
        if len(ops) != 2:
            raise ValueError(
                "$indexOfBytes supports the 2-arg form only — the "
                "range form's byte offsets need byte-sliced haystacks; "
                "use $indexOfCP for code-point ranges")
        # byte index = UTF-8 length of the prefix BEFORE the match
        # (0-based; -1 when absent) — instr gives the code-point
        # position, octet_length(left(...)) converts it to bytes
        s, sub = ops
        cp = F.call_function("instr", s, sub)   # 1-based, 0 = missing
        return F.when(cp == 0, F.lit(-1)).otherwise(
            F.octet_length(F.substring(s, 1, (cp - 1).cast("int")))
        ).cast("int")
    if op == "$binarySize":
        # UTF-8 byte size of a string / length of a binary payload
        return F.octet_length(_expr(arg, env)).cast("int")
    if op == "$replaceAll":
        # LITERAL find/replace, Mongo's contract — F.replace is
        # literal (regexp_replace would reinterpret the pattern)
        return F.replace(_expr(arg["input"], env),
                         _expr(arg["find"], env),
                         _expr(arg["replacement"], env))
    if op == "$replaceOne":
        s = _expr(arg["input"], env)
        find = _expr(arg["find"], env)
        repl = _expr(arg["replacement"], env)
        pos = F.instr(s, find)
        return F.when(pos == 0, s).otherwise(F.concat(
            F.substring(s, F.lit(1), pos - 1), repl,
            F.substring(s, pos + F.length(find),
                        F.length(s))))
    # date math
    if op == "$dateTrunc":
        if arg.get("binSize", 1) != 1:
            raise ValueError("$dateTrunc binSize != 1 is unsupported")
        unit = arg["unit"]
        if unit not in ("year", "quarter", "month", "week", "day",
                        "hour", "minute", "second", "millisecond"):
            raise ValueError(f"unsupported $dateTrunc unit: {unit!r}")
        tz = _tz_literal(arg)
        if unit == "week":
            # Mongo weeks default to SUNDAY start (startOfWeek option
            # for any other day); Spark's date_trunc('week') is pinned
            # Monday — truncate to day and step back to the week-start
            # day instead (r14: closes the week-start deviation)
            idx = _week_start_idx(arg.get("startOfWeek", "sunday"))
            day = F.to_date(_tz_in(_expr(arg["date"], env), tz))
            back = (F.dayofweek(day) - F.lit(idx) + 7) % 7
            return _tz_out(
                F.date_sub(day, back.cast("int")).cast("timestamp"), tz)
        # zoned truncation: boundaries are the ZONE's wall-clock
        # boundaries; the result is the UTC instant of that boundary
        return _tz_out(
            F.date_trunc(unit, _tz_in(_expr(arg["date"], env), tz)), tz)
    if op in ("$dateAdd", "$dateSubtract"):
        unit = arg["unit"]
        if unit not in ("year", "quarter", "month", "week", "day",
                        "hour", "minute", "second", "millisecond",
                        "microsecond"):
            raise ValueError(f"unsupported {op} unit: {unit!r}")
        amt = _expr(arg["amount"], env)
        if op == "$dateSubtract":
            amt = -amt
        start = _expr(arg["startDate"], env)
        tz = _tz_literal(arg)
        if tz and unit in ("year", "quarter", "month", "week", "day"):
            # Mongo: for day-or-larger units the arithmetic is the
            # ZONE's calendar (a +1 day across a DST change keeps the
            # wall-clock time); hour and below stay absolute instants
            return _tz_out(
                F.timestamp_add(unit, amt, _tz_in(start, tz)), tz)
        return F.timestamp_add(unit, amt, start)
    if op == "$dateDiff":
        unit = arg["unit"]
        if unit not in ("year", "quarter", "month", "week", "day",
                        "hour", "minute", "second"):
            raise ValueError(f"unsupported $dateDiff unit: {unit!r}")
        # Mongo counts BOUNDARY CROSSINGS, not complete intervals:
        # dateDiff(23:00, next day 01:00, 'day') == 1. truncate both
        # ends to the unit, then count whole units between truncations.
        tz = _tz_literal(arg)
        if unit == "week":
            # week boundaries follow startOfWeek (default Sunday, as
            # in $dateTrunc) — truncate both ends to their week start,
            # then the day gap is an exact multiple of 7 (r14)
            idx = _week_start_idx(arg.get("startOfWeek", "sunday"))

            def wk(e):
                day = F.to_date(_tz_in(_expr(arg[e], env), tz))
                back = (F.dayofweek(day) - F.lit(idx) + 7) % 7
                return F.date_sub(day, back.cast("int"))
            return (F.datediff(wk("endDate"), wk("startDate")) / 7) \
                .cast("long")
        # boundaries counted in the zone's wall clock; the count
        # itself is zone-free, so no shift back
        s = F.date_trunc(unit, _tz_in(_expr(arg["startDate"], env), tz))
        e = F.date_trunc(unit, _tz_in(_expr(arg["endDate"], env), tz))
        return F.timestamp_diff(unit, s, e).cast("long")
    if op in ("$bitAnd", "$bitOr", "$bitXor"):
        # Mongo 6.3 bitwise family over int/long args; the empty-array
        # forms return the operator's identity (all-ones for AND,
        # zero for OR/XOR — Mongo's documented values)
        if not isinstance(arg, list):
            raise ValueError(f"{op} expects an array of integer "
                             "expressions")
        if not arg:
            return F.lit(-1 if op == "$bitAnd" else 0)
        meth = {"$bitAnd": "bitwiseAND", "$bitOr": "bitwiseOR",
                "$bitXor": "bitwiseXOR"}[op]
        acc = _expr(arg[0], env)
        for a in arg[1:]:
            acc = getattr(acc, meth)(_expr(a, env))
        return acc
    if op == "$bitNot":
        return F.bitwise_not(_expr(arg, env))
    if op == "$type":
        # BSON type name of the value. Rectangular frames have one
        # static type per column, so this folds to a constant per
        # expression — except SQL NULL, which reports 'null' (a
        # missing field and a null field are the same thing here;
        # Mongo's 'missing' never occurs)
        c = _expr(arg, env)
        return F.when(c.isNull(), F.lit("null")) \
            .otherwise(_bson_type_col(c))
    if op == "$isNumber":
        c = _expr(arg, env)
        t = F.call_function("typeof", c)
        return c.isNotNull() & (
            t.isin("bigint", "int", "smallint", "tinyint",
                   "double", "float") | t.startswith("decimal"))
    if op == "$isArray":
        a = arg[0] if isinstance(arg, list) and len(arg) == 1 else arg
        c = _expr(a, env)
        return c.isNotNull() \
            & F.call_function("typeof", c).startswith("array")
    if op in UNSUPPORTED_EXPR_OPS:
        raise UnsupportedMongoStage(
            f"{op} is refused by design: {UNSUPPORTED_EXPR_OPS[op]}")
    raise ValueError(f"unsupported expression operator: {op}")


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
        "query planner; BM25 scoring lives in plans/llmdata.py"),
}


def _mongo_to_date(c: Column, use_try: bool = False) -> Column:
    """Mongo's number→date rule: a numeric value is MILLISECONDS since
    the epoch (r14 — a bare ``cast(timestamp)`` reads numbers as
    SECONDS, a silent 1000× divergence). Strings parse, date/timestamp
    pass through. The numeric branches route through a string cast
    because not every input type casts straight to long at analysis
    time (DATE does not) — the string leg is exact for integers, and
    the typeof guard keeps it from ever evaluating on non-numeric
    columns."""
    t = F.call_function("typeof", c)
    as_str = c.cast("string")
    int_ms = as_str.try_cast("long") if use_try else as_str.cast("long")
    dbl = as_str.try_cast("double") if use_try else as_str.cast("double")
    # the double→long step honors the try discipline too: an
    # out-of-long-range double (1e300) must route to onError under
    # use_try, not abort the job under ANSI (r14 ADVICE)
    dbl_ms = dbl.try_cast("long") if use_try else dbl.cast("long")
    base = c.try_cast("timestamp") if use_try else c.cast("timestamp")
    return (F.when(t.isin("bigint", "int", "smallint", "tinyint"),
                   F.timestamp_millis(int_ms))
            .when(t.isin("double", "float") | t.startswith("decimal"),
                  F.timestamp_millis(dbl_ms))
            .otherwise(base))


def _bson_type_col(c: Column) -> Column:
    """Map Spark's ``typeof()`` name to the BSON type name Mongo's
    ``$type`` returns. Evaluated as a column expression so it composes
    anywhere, but the typeof of a fixed-schema expression is a
    runtime constant — Catalyst folds the whole CASE chain."""
    t = F.call_function("typeof", c)
    return (F.when(t.startswith("array"), F.lit("array"))
            .when(t.startswith("struct") | t.startswith("map"),
                  F.lit("object"))
            .when(t.startswith("decimal"), F.lit("decimal"))
            .when(t == "bigint", F.lit("long"))
            .when(t.isin("int", "smallint", "tinyint"), F.lit("int"))
            .when(t.isin("double", "float"), F.lit("double"))
            .when(t == "boolean", F.lit("bool"))
            .when(t.isin("date", "timestamp", "timestamp_ntz"),
                  F.lit("date"))
            .when(t == "binary", F.lit("binData"))
            .otherwise(t))


#: Mongo $dateToString format specifiers -> Spark date_format patterns.
_DATE_SPECIFIERS = {"%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH",
                    "%M": "mm", "%S": "ss", "%L": "SSS", "%j": "DDD",
                    "%%": "%"}

#: week-family specifiers with no SimpleDateFormat equivalent under
#: Mongo's semantics (Spark 3+ removed week pattern letters; %U is
#: Sunday-based, %w is 1=Sunday): computed as column expressions and
#: concat-spliced between plain date_format segments (r14).
_COMPUTED_SPECIFIERS = {"%w", "%u", "%U", "%V", "%G"}


def _computed_specifier(spec: str, d: Column) -> Column:
    """One computed $dateToString specifier over the (zone-shifted)
    date column: %w day-of-week 1=Sunday, %u ISO day-of-week 1=Monday,
    %U Sunday-based week (00-53), %V ISO week (01-53), %G ISO
    week-numbering year — padded exactly as Mongo pads them."""
    if spec == "%w":
        return F.dayofweek(d).cast("string")
    if spec == "%u":
        return (((F.dayofweek(d) + 5) % 7) + 1).cast("string")
    if spec == "%U":
        wk = F.floor((F.dayofyear(d) + 6 - (F.dayofweek(d) - 1)) / 7)
        return F.lpad(wk.cast("string"), 2, "0")
    if spec == "%V":
        return F.lpad(F.weekofyear(d).cast("string"), 2, "0")
    if spec == "%G":
        iso_dow = ((F.dayofweek(d) + 5) % 7) + 1
        thu = F.date_add(d.cast("date"), (F.lit(4) - iso_dow).cast("int"))
        return F.lpad(F.year(thu).cast("string"), 4, "0")
    raise AssertionError(spec)


def _mongo_date_format(fmt: str) -> str:
    """Translate a Mongo strftime-style format into Spark's
    SimpleDateFormat-style pattern, rejecting specifiers outside the
    supported table (silently mistranslating a date format corrupts
    every downstream partition key). Literal text is quoted where it
    could collide with pattern letters."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            spec = fmt[i:i + 2]
            if spec not in _DATE_SPECIFIERS:
                raise ValueError(
                    f"unsupported $dateToString specifier: {spec!r}")
            out.append(_DATE_SPECIFIERS[spec])
            i += 2
        else:
            ch = fmt[i]
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def _type_family(dt) -> str | None:
    from pyspark.sql import types as ST

    if isinstance(dt, ST.BooleanType):
        return "bool"
    if isinstance(dt, ST.NumericType):
        return "num"
    if isinstance(dt, ST.StringType):
        return "str"
    return None


def _lit_family(v: Any) -> str | None:
    if isinstance(v, bool):          # before int: bool subclasses int
        return "bool"
    if isinstance(v, (int, float)):
        return "num"
    if isinstance(v, str):
        return "str"
    return None


def _field_type(schema, path: str):
    from pyspark.sql import types as ST

    node = schema
    for part in path.split("."):
        if not isinstance(node, ST.StructType) or part not in node.names:
            return None
        node = node[part].dataType
    return node


def _compatible(schema, path: str, v: Any) -> bool | None:
    """Mongo type bracketing: a query literal only matches values of its
    own BSON type family. True/False when both families resolve; None
    (unknown — keep the plain comparison) otherwise."""
    if schema is None or v is None:
        return None
    cf = _type_family(_field_type(schema, path))
    lf = _lit_family(v)
    return (cf == lf) if cf is not None and lf is not None else None


def _regex_cond(col: Column, pattern: Any, options: str | None) -> Column:
    """``$regex`` (optionally with ``$options``): Mongo's i/m/s/x flags
    are exactly Java's inline-flag letters, so they prefix the pattern
    and the whole predicate stays one JVM RLIKE."""
    if not isinstance(pattern, str):
        raise ValueError("$regex expects a string pattern")
    if options:
        if not set(options) <= set("imsx"):
            raise ValueError(f"unsupported $regex options: {options!r}")
        pattern = f"(?{options})" + pattern
    return col.rlike(pattern)


#: the BSON type names a ``$match`` ``$type`` predicate can actually
#: observe here — exactly what :func:`_bson_type_col` can return, plus
#: 'null' (handled via isNull). Any other name raises (r14 ADVICE).
_BSON_MATCHABLE_TYPES = frozenset({
    "double", "string", "object", "array", "binData", "bool", "date",
    "null", "int", "long", "decimal"})


def _match_op(col: Column, op: str, val: Any, spec: dict | None = None,
              schema=None, field: str | None = None) -> Column:
    """One ``$match`` query operator applied to ``col`` (a field
    reference, or an $elemMatch lambda element). ``field``+``schema``
    enable type bracketing when the target is a named column; ``spec``
    is the enclosing operator document (for ``$regex``'s ``$options``
    sibling key)."""
    def conj(conds):
        acc = None
        for c in conds:
            acc = c if acc is None else acc & c
        return acc if acc is not None else F.lit(True)

    if op in _CMP:
        if field is not None and _compatible(schema, field, val) is False:
            # type-bracketed: cross-type eq/range never match; $ne
            # matches every (typed) value
            return F.lit(op == "$ne")
        return getattr(col, _CMP[op])(F.lit(val))
    if op in ("$in", "$nin"):
        ok = [x for x in val
              if field is None
              or _compatible(schema, field, x) is not False]
        inset = col.isin(*ok) if ok else F.lit(False)
        if op == "$nin":
            # Mongo: $nin also matches docs where the field is
            # missing/null — null-inclusive like $not/$nor
            return F.coalesce(~inset, F.lit(True))
        return inset
    if op == "$exists":
        return col.isNotNull() if val else col.isNull()
    if op == "$type":
        # BSON type names / numeric codes / 'number' alias, scalar or
        # array-of-alternatives; a null value matches only type 'null'
        # (code 10) — same value-typing as the $type expression
        wanted: set[str] = set()
        for v in (val if isinstance(val, list) else [val]):
            if isinstance(v, bool) or not isinstance(v, (str, int)):
                raise ValueError(f"$type expects BSON type names or "
                                 f"codes, got {v!r}")
            if v == "number":
                wanted |= {"int", "long", "double", "decimal"}
                continue
            code = {1: "double", 2: "string", 3: "object", 4: "array",
                    5: "binData", 8: "bool", 9: "date", 10: "null",
                    16: "int", 18: "long", 19: "decimal"}
            name = code.get(v, v) if isinstance(v, int) else v
            if not isinstance(name, str):
                raise ValueError(f"unknown BSON $type code: {v!r}")
            if name not in _BSON_MATCHABLE_TYPES:
                # a valid-but-unrepresentable BSON name ('objectId',
                # 'timestamp', 'regex', 'minKey'...) or a typo'd one
                # ('objectid') would compile to an always-false
                # predicate — raise-don't-guess, mirroring the numeric
                # branch (r14 ADVICE)
                raise ValueError(
                    f"$type name {name!r} is not representable in this "
                    f"rectangular engine (supported: "
                    f"{sorted(_BSON_MATCHABLE_TYPES)} + 'number')")
            wanted.add(name)
        cond = _bson_type_col(col).isin(*sorted(wanted - {"null"}))
        if "null" in wanted:
            return F.coalesce(cond, F.lit(False)) | col.isNull()
        return cond & col.isNotNull()
    if op == "$regex":
        return _regex_cond(col, val, (spec or {}).get("$options"))
    if op == "$size":
        return F.size(col) == F.lit(int(val))
    if op == "$mod":
        if not isinstance(val, list) or len(val) != 2:
            raise ValueError("$mod expects [divisor, remainder]")
        return (col % F.lit(val[0])) == F.lit(val[1])
    if op == "$all":
        if not isinstance(val, list):
            raise ValueError("$all expects an array of values")
        if not val:
            # Mongo: {$all: []} matches NO documents (empty conj would
            # be vacuously true)
            return F.lit(False)
        return conj([F.array_contains(col, F.lit(v)) for v in val])
    if op == "$elemMatch":
        if not isinstance(val, dict) or not val:
            raise ValueError("$elemMatch expects a non-empty document")
        if any(k.startswith("$") for k in val):
            # scalar form: operators apply to the element itself
            return F.exists(col, lambda e: conj(
                [_match_op(e, k, v, val) for k, v in val.items()
                 if k != "$options"]))
        # sub-document form: per-field conditions on the element

        def elem_cond(e):
            conds = []
            for fname, fspec in val.items():
                tgt = e[fname]
                if isinstance(fspec, dict) \
                        and any(k.startswith("$") for k in fspec):
                    conds.extend(_match_op(tgt, k, v, fspec)
                                 for k, v in fspec.items()
                                 if k != "$options")
                else:
                    conds.append(tgt == F.lit(fspec))
            return conj(conds)

        return F.exists(col, elem_cond)
    if op == "$not":
        # Mongo's $not matches where the condition FAILS, including
        # null/missing fields — a null predicate must flip to True,
        # hence the coalesce (plain ~ would drop nulls)
        if isinstance(val, str):
            inner = _regex_cond(col, val, None)
        elif isinstance(val, dict) and val:
            inner = conj([_match_op(col, k, v, val,
                                    schema=schema, field=field)
                          for k, v in val.items() if k != "$options"])
        else:
            raise ValueError("$not expects an operator document or regex")
        return F.coalesce(~inner, F.lit(True))
    raise ValueError(f"unsupported $match operator: {op}")


def _match_cond(cond: dict[str, Any], schema=None) -> Column:
    """``schema`` (the input DataFrame's) enables Mongo's type-bracketed
    matching: an int query against a string field matches NOTHING (and
    $ne matches everything) instead of crashing on ANSI's runtime
    string→number cast — found by the pipeline fuzz test."""
    if not cond:
        return F.lit(True)  # Mongo: {$match: {}} is match-all
    parts: list[Column] = []
    for field, spec in cond.items():
        if field == "$expr":
            # aggregation-expression predicate: the only way Mongo
            # compares two FIELDS in a $match — full expression
            # language, boolean result ($$ROOT bound from the schema)
            env = None
            if schema is not None:
                cols = [n for n in schema.names if not n.startswith("__")]
                root = F.struct(*[F.col(c).alias(c) for c in cols])
                env = {"ROOT": root, "CURRENT": root}
            parts.append(_expr(spec, env).cast("boolean"))
        elif field in ("$and", "$or"):
            sub = [_match_cond(c, schema) for c in spec] or [F.lit(True)]
            acc = sub[0]
            for c in sub[1:]:
                acc = (acc & c) if field == "$and" else (acc | c)
            parts.append(acc)
        elif field == "$nor":
            # fails-all-clauses, null/missing included (the $not rule)
            for c in spec:
                parts.append(F.coalesce(~_match_cond(c, schema),
                                        F.lit(True)))
        elif field == "$sampleRate":
            # per-document bernoulli sample, Mongo's nondeterminism
            parts.append(F.rand() < F.lit(float(spec)))
        elif isinstance(spec, dict) and any(k.startswith("$") for k in spec):
            col = F.col(field)
            for op, val in spec.items():
                if op == "$options":
                    if "$regex" not in spec:
                        raise ValueError("$options requires $regex")
                    continue
                parts.append(_match_op(col, op, val, spec,
                                       schema=schema, field=field))
        else:
            if _compatible(schema, field, spec) is False:
                parts.append(F.lit(False))
            else:
                parts.append(F.col(field) == F.lit(spec))
    acc = parts[0]
    for c in parts[1:]:
        acc = acc & c
    return acc


def _include_tree(includes: dict[str, Any]) -> dict:
    """Group dotted inclusion paths by root into a nested tree: leaves
    are (path, spec-value) tuples, inner nodes are dicts. Mongo rejects
    path collisions ({'a': 1, 'a.b': 1}) — so do we."""
    tree: dict = {}
    for name, v in includes.items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                raise ValueError(f"$project path collision at '{name}'")
            node = nxt
        if isinstance(node.get(parts[-1]), dict):
            raise ValueError(f"$project path collision at '{name}'")
        node[parts[-1]] = (name, v)
    return tree


def _tree_col(node, parent_path: str = "", env: dict | None = None
              ) -> Column:
    if isinstance(node, tuple):
        path, v = node
        return F.col(path) if v in (1, True) else _expr(v, env)
    struct = F.struct(*[
        _tree_col(child,
                  f"{parent_path}.{k}" if parent_path else k,
                  env).alias(k)
        for k, child in node.items()])
    if parent_path:
        # Mongo: a null/missing parent document stays null in the output,
        # not a struct of nulls
        return F.when(F.col(parent_path).isNull(),
                      F.lit(None)).otherwise(struct)
    return struct


def _path_exists(schema, path: str) -> bool:
    """Does a (possibly dotted) field path resolve in this schema?
    A path segment that lands on an ARRAY of documents raises instead of
    answering: Mongo projects through arrays ({'products.price': 1}
    keeps products as an array of {price} docs), a shape the struct
    reconstruction here doesn't build — silently dropping the field
    would lose data, so the caller must ``$unwind`` first (which is what
    the reference's own pipelines do, ref loanapplication_table.py:33)."""
    from pyspark.sql import types as ST

    node = schema
    parts = path.split(".")
    for i, part in enumerate(parts):
        if isinstance(node, ST.ArrayType) and i > 0:
            raise ValueError(
                f"$project include through an array at '{path}' is "
                "unsupported: $unwind the array first")
        if not isinstance(node, ST.StructType) or part not in node.names:
            return False
        node = node[part].dataType
    return True


def _project(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    keep_id = "_id" in df.columns and spec.get("_id", 1) not in (0, False)
    includes = {k: v for k, v in spec.items()
                if k != "_id" and v not in (0, False)}
    excludes = [k for k, v in spec.items() if v in (0, False) and k != "_id"]
    if includes:
        # Mongo omits includes of fields the document doesn't have;
        # computed ('$ref'/literal) values are always kept
        includes = {k: v for k, v in includes.items()
                    if v not in (1, True) or _path_exists(df.schema, k)}
        cols: list[Column] = []
        if keep_id:
            cols.append(F.col("_id"))
        env = _root_env(df)
        for root, child in _include_tree(includes).items():
            cols.append(_tree_col(child, root if isinstance(child, dict)
                                  else "", env).alias(root))
        return df.select(*cols)
    # exclusion projection. DataFrame.drop ignores nested fields, so a
    # dotted exclusion path would silently SURVIVE where Mongo removes
    # it — fail loudly instead of diverging.
    dotted = [k for k in excludes if "." in k]
    if dotted:
        raise ValueError(
            f"$project exclusion of nested paths is unsupported: {dotted} "
            "(use an inclusion projection or flatten first)")
    drop = excludes + ([] if keep_id else ["_id"])
    return df.drop(*[c for c in drop if c in df.columns])


def _root_env(df: DataFrame, extra: dict | None = None) -> dict:
    """Stage-level ``$$ROOT``/``$$CURRENT`` bindings: the whole current
    document as one struct (translator-internal ``__``-prefixed columns
    excluded, so ``$push: "$$ROOT"`` never leaks ``__pos``/``__lk``
    scratch). At stage start CURRENT is ROOT, Mongo's rule."""
    cols = [c for c in df.columns if not c.startswith("__")]
    root = F.struct(*[F.col(c).alias(c) for c in cols])
    return {**(extra or {}), "ROOT": root, "CURRENT": root}


def _group_key(gid: Any) -> Column:
    """``_id`` compiler: an operator doc or field ref evaluates as an
    expression; a COMPOSITE document ({a: "$x", b: {$op: ...}}, Mongo's
    multi-field group key — no $-key at the top) becomes a struct whose
    fields keep the document's names, so ``_id.a`` works downstream
    exactly as in Mongo."""
    if isinstance(gid, dict) and not (
            len(gid) == 1 and next(iter(gid)).startswith("$")):
        if not gid or any(k.startswith("$") for k in gid):
            raise ValueError(f"malformed composite _id: {gid!r}")
        return F.struct(*[_expr(v).alias(k) for k, v in gid.items()])
    return _expr(gid)


def _topn_agg(op: str, agg: dict, env: dict | None = None) -> Column:
    """Mongo 5.2 rank-family group accumulators, one aggregate each:

    - ``$top/$bottom {output, sortBy}`` — min_by/max_by on the sort key
      (no array materialized);
    - ``$topN/$bottomN {output, sortBy, n}`` — collect (sortKey,
      output) pairs, sort_array by the key, slice n, project the
      output — the whole chain is ONE agg expression inside codegen,
      never a per-group row_number shuffle. COMPOUND (multi-field,
      mixed-direction) sortBy keys go through ``array_sort`` with the
      per-field asc/desc comparator (:func:`_lookup_sort_cmp`) —
      same single-aggregate shape, O(group) buffer (the $top/$bottom
      scalar forms stay O(1) min_by/max_by on a SINGLE sort field).

    TIE CONTRACT (r15 — a documented guarantee, not a deviation):
    Mongo leaves the order of elements whose sortBy keys compare equal
    UNSPECIFIED (their docs: "ties are nondeterministic without a
    unique sort key"). Here every path pins them deterministically:

    - SINGLE-field sortBy: equal keys order by the OUTPUT value in the
      walk direction (asc walk → min output wins, desc walk → max) —
      the (key, output) ordering struct / sort_array over (k, o).
    - COMPOUND sortBy: after all fields compare equal, the whole
      element (remaining payload) compares ASCENDING — a mixed-
      direction key has no single walk direction, so ascending is the
      one coherent rule (:func:`_lookup_sort_cmp` fallthrough).
    - Null sort keys rank below every value, BSON's order, on both
      paths (the bare min_by/max_by ordering column used to SKIP
      null keys — the struct wrapper restores BSON semantics).

    Any Mongo deployment's answer is one of the permitted answers;
    this engine always returns the same one, which is what makes the
    rank family oracle-gateable. Tested with deliberately tied
    fixtures (tests/test_mongoql.py::test_rank_family_tie_contract).

    MEMORY BOUND, documented: the N-ary forms (and ``$push``/
    ``$addToSet``) buffer O(group size) rows in the aggregation buffer
    — collect_list materializes the whole group before the slice, on
    the map side (partial agg) as well as the reduce side. Mongo's
    bounded heap is O(n). There is NO partial-agg-safe bounded top-k in
    Spark's built-ins: a map-side ``slice(sort_array(...))`` pre-cut is
    not merge-correct (two partial top-n slices can drop globally-top
    rows only when combined with non-slice accumulators in the same
    buffer — and Catalyst offers no per-accumulator partial override),
    so a pathological group (one key with 10^8 rows) can OOM the
    buffer. For large-group regimes rewrite as the bounded two-shuffle
    shape the engine already provides: ``$setWindowFields`` ``$rank``
    over the sort key + ``$match {rank: {$lte: n}}`` + ``$group``
    ``$push`` of the survivors — the window sort SPILLS to disk, so
    memory stays bounded at any group size. ``$top``/``$bottom``
    (scalar min_by/max_by) are O(1) and safe at any skew.
    """
    sort_by = agg["sortBy"]
    if not sort_by:
        raise ValueError(f"{op} needs a non-empty sortBy")
    if len(sort_by) != 1:
        # compound / mixed-direction key: comparator-sorted array path
        # (aliases avoid dotted-path struct-field ambiguity)
        items = list(sort_by.items())
        out = _expr(agg["output"], env)
        elem = F.struct(
            *[F.col(f).alias(f"__s{i}") for i, (f, _) in enumerate(items)],
            out.alias("__o"))
        spec = {f"__s{i}": int(d) for i, (_, d) in enumerate(items)}
        arr = F.array_sort(F.collect_list(elem), _lookup_sort_cmp(spec))
        if op == "$top":
            return F.element_at(arr, 1)["__o"]
        if op == "$bottom":
            return F.element_at(arr, -1)["__o"]
        n = int(agg["n"])
        if op == "$topN":
            sliced = F.slice(arr, 1, n)
        else:  # $bottomN: the LAST n, emitted in sortBy order
            sliced = F.slice(
                arr, F.greatest(F.lit(1), F.size(arr) - n + 1), F.lit(n))
        return F.transform(sliced, lambda x: x["__o"])
    (sf, sdir), = sort_by.items()
    key, out = F.col(sf), _expr(agg["output"], env)
    if op in ("$top", "$bottom"):
        # $top = FIRST in sortBy order; $bottom = last. TIE CONTRACT
        # (r15, docstring): elements equal on the single sortBy key
        # order by their OUTPUT value in the walk direction — the
        # (key, output) ordering struct pins the pick, and null keys
        # rank below every value (BSON's rule, which the bare
        # min_by/max_by ordering column used to SKIP). Mongo leaves
        # both unspecified; this is the translator's documented
        # deterministic pick. Requires an orderable output type
        # (maps are not).
        fn = (F.min_by if (op == "$top") == (sdir == 1) else F.max_by)
        return fn(out, F.struct(key.alias("k"), out.alias("o")))
    n = int(agg["n"])
    asc = (sdir == 1) == (op == "$topN")
    # sort_array over (k, o) structs: lexicographic, so key ties order
    # by the output value in the walk direction — the same r15 tie
    # contract as $top/$bottom above, here for free
    pairs = F.sort_array(F.collect_list(F.struct(key.alias("k"),
                                                 out.alias("o"))), asc)
    sliced = F.slice(pairs, 1, n)
    if op == "$bottomN":
        # Mongo emits the bottom n IN sortBy order — the slice walked
        # from the far end, so restore the declared direction
        sliced = F.reverse(sliced)
    return F.transform(sliced, lambda x: x["o"])


def _group(df: DataFrame, spec: dict[str, Any],
           env: dict | None = None,
           sort_spec: dict[str, Any] | None = None) -> DataFrame:
    """``$group`` compiler. ``sort_spec`` (r15) is an ABSORBED ``$sort``
    spec ({field: ±1}): when a ``$sort`` immediately precedes the
    ``$group`` (the 'latest doc per key' idiom), the caller passes its
    spec here instead of sorting the frame, and every order-sensitive
    accumulator (``$first/$last/$firstN/$lastN/$push/$mergeObjects``)
    compiles AGAINST that key — ``$first`` becomes ``$top``,
    ``$firstN`` becomes ``$topN``, ``$push`` packs comparator-sorted.
    Order-insensitive accumulators ignore it (the $sort is a no-op for
    them). This removes the global sort entirely: one shuffle, the
    sort order lives inside the aggregation buffers — the lowering
    that makes the idiom legal inside a correlated ``$lookup``, where
    a per-document $sort must never become a global one."""
    env = env if env is not None else _root_env(df)
    gid = spec["_id"]
    ops = {next(iter(a)) for k, a in spec.items() if k != "_id"}
    order_ops = {"$first", "$last", "$firstN", "$lastN", "$mergeObjects"}
    if sort_spec is not None:
        if any("." in f for f in sort_spec):
            raise ValueError(
                "$sort before $group on a dotted path is unsupported — "
                "$addFields the value to a top-level field first")
        missing = [f for f in sort_spec if f not in df.columns]
        if missing:
            raise ValueError(
                f"$sort before $group references field(s) {missing} "
                "not present at the $group input — keep them in the "
                "$project/$addFields upstream")
    if ops & order_ops and sort_spec is None:
        # position must be MATERIALIZED before the aggregation (Spark
        # rejects non-deterministic expressions inside agg functions);
        # on a just-sorted df the id is globally monotone, so
        # min_by/max_by over it reproduce Mongo's "first/last after
        # $sort" semantics
        df = df.withColumn("__pos", F.monotonically_increasing_id())

    def sorted_elem_and_cmp(out_col):
        """(element struct carrying the sort key + payload, comparator)
        for the absorbed-sort array paths."""
        items = list(sort_spec.items())
        elem = F.struct(
            *[F.col(f).alias(f"__s{i}") for i, (f, _) in enumerate(items)],
            out_col.alias("__o"))
        cmp = _lookup_sort_cmp(
            {f"__s{i}": int(d) for i, (_, d) in enumerate(items)})
        return elem, cmp
    aggs = []
    for name, agg in spec.items():
        if name == "_id":
            continue
        (op, arg), = agg.items()
        if op == "$sum" and arg == 1:
            aggs.append(F.count(F.lit(1)).alias(name))
        elif op == "$sum":
            aggs.append(F.sum(_expr(arg, env)).alias(name))
        elif op == "$avg":
            aggs.append(F.avg(_expr(arg, env)).alias(name))
        elif op == "$min":
            aggs.append(F.min(_expr(arg, env)).alias(name))
        elif op == "$max":
            aggs.append(F.max(_expr(arg, env)).alias(name))
        elif op == "$count":
            aggs.append(F.count(F.lit(1)).alias(name))
        elif op == "$push":
            if sort_spec is not None:
                # absorbed $sort (r15): the push order is SPECIFIED —
                # Mongo's document order after the sort — so pack in
                # comparator order (key ties fall through to the
                # whole-element compare, the rank-family tie contract)
                elem, cmp = sorted_elem_and_cmp(_expr(arg, env))
                aggs.append(F.transform(
                    F.array_sort(F.collect_list(elem), cmp),
                    lambda x: x["__o"]).alias(name))
                continue
            # Mongo preserves document order; a distributed groupBy has
            # none, so pin it (sorted) — deterministic beats unspecified,
            # the $lookup convention
            aggs.append(F.sort_array(F.collect_list(_expr(arg, env)))
                        .alias(name))
        elif op == "$addToSet":
            aggs.append(F.sort_array(F.collect_set(_expr(arg, env)))
                        .alias(name))
        elif op in ("$first", "$last"):
            if sort_spec is not None:
                # absorbed $sort (r15): $first after $sort IS $top (and
                # $last is $bottom) — Mongo documents the equivalence;
                # the rank-family compiler brings its tie contract
                aggs.append(_topn_agg(
                    "$top" if op == "$first" else "$bottom",
                    {"sortBy": sort_spec, "output": arg}, env).alias(name))
                continue
            # meaningful only after $sort, same caveat as Mongo's docs
            fn = F.min_by if op == "$first" else F.max_by
            aggs.append(fn(_expr(arg, env), F.col("__pos")).alias(name))
        elif op in ("$top", "$bottom", "$topN", "$bottomN"):
            aggs.append(_topn_agg(op, arg, env).alias(name))
        elif op == "$mergeObjects":
            # accumulator form (r14): per field, the value of the LAST
            # document (in document order, i.e. after a $sort) whose
            # field is non-null — max_by over the materialized __pos,
            # null keys ignored. Rectangular deviation, documented: a
            # field that is SQL NULL counts as missing (Mongo would
            # let an explicit null overwrite; structs cannot tell the
            # two apart), so sparse per-key docs collapse to the
            # freshest non-null value per field — the idiom's actual
            # use.
            from pyspark.sql import types as ST
            inner = _expr(arg, env)
            dt = df.select(inner.alias("__mo")).schema["__mo"].dataType
            if not isinstance(dt, ST.StructType):
                raise ValueError(
                    "$mergeObjects accumulator needs a document "
                    f"(struct) expression, got {dt.simpleString()}")
            if sort_spec is not None:
                # absorbed $sort (r15): per field, the last non-null in
                # SORT order — a comparator-sorted array walked left to
                # right with a coalesce fold (x non-null wins over the
                # accumulator, so the walk ends on the last non-null).
                # Same SQL-NULL-counts-as-missing rule as the __pos
                # form below.
                elem, cmp = sorted_elem_and_cmp(inner)
                arr = F.array_sort(F.collect_list(elem), cmp)

                def last_non_null(fname):
                    # closure factory: F.aggregate's merge lambda must
                    # be EXACTLY 2-ary (PySpark introspects arity)
                    return lambda acc, x: F.coalesce(x["__o"][fname], acc)

                aggs.append(F.struct(*[
                    F.aggregate(arr, F.lit(None).cast(f.dataType),
                                last_non_null(f.name)).alias(f.name)
                    for f in dt.fields]).alias(name))
                continue
            aggs.append(F.struct(*[
                F.max_by(inner[f.name],
                         F.when(inner[f.name].isNotNull(),
                                F.col("__pos"))).alias(f.name)
                for f in dt.fields]).alias(name))
        elif op in ("$minN", "$maxN"):
            # n smallest ascending / n largest descending (Mongo order)
            aggs.append(F.slice(
                F.sort_array(F.collect_list(_expr(arg["input"], env)),
                             op == "$minN"),
                1, int(arg["n"])).alias(name))
        elif op in ("$firstN", "$lastN"):
            if sort_spec is not None:
                # absorbed $sort (r15): $firstN after $sort IS $topN
                # ($lastN is $bottomN — both emit in sortBy order,
                # Mongo's documented equivalence)
                aggs.append(_topn_agg(
                    "$topN" if op == "$firstN" else "$bottomN",
                    {"sortBy": sort_spec, "output": arg["input"],
                     "n": arg["n"]}, env).alias(name))
                continue
            # document-order head/tail via the materialized __pos key;
            # lastN keeps the original order (slice from the far end)
            pairs = F.sort_array(F.collect_list(F.struct(
                F.col("__pos").alias("k"), _expr(arg["input"], env).alias("o"))))
            n = int(arg["n"])
            sliced = (F.slice(pairs, 1, n) if op == "$firstN"
                      else F.reverse(F.slice(F.reverse(pairs), 1, n)))
            aggs.append(F.transform(sliced, lambda x: x["o"]).alias(name))
        elif op == "$stdDevPop":
            aggs.append(F.stddev_pop(_expr(arg, env)).alias(name))
        elif op == "$stdDevSamp":
            aggs.append(F.stddev_samp(_expr(arg, env)).alias(name))
        elif op in ("$median", "$percentile"):
            # Mongo 7.0 (t-digest "approximate" method); lowered to
            # Spark's EXACT distributed percentile. CONTRACT, not a
            # deviation (r15): Mongo's own docs define $percentile's
            # approximate method as returning an implementation-
            # dependent value NEAR the requested quantile; the exact
            # linear-interpolation answer is inside every t-digest
            # error envelope, deterministic (gate-able), and identical
            # at any cluster size. $percentile returns the array of
            # requested ps. The window form shares this rule.
            y = _expr(arg["input"], env)
            if op == "$median":
                aggs.append(F.percentile(y, F.lit(0.5)).alias(name))
            else:
                ps = [float(p) for p in arg["p"]]
                aggs.append(F.percentile(y, F.lit(ps)).alias(name))
        else:
            raise ValueError(f"unsupported $group accumulator: {op}")
    if gid is None:
        return df.agg(*aggs).select(F.lit(None).alias("_id"), "*")
    return df.groupBy(_group_key(gid).alias("_id")).agg(*aggs)


def _bucket(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$bucket``: left-closed [b_i, b_{i+1}) intervals over a
    monotone boundary list; ``_id`` is the bucket's LOWER bound (Mongo's
    contract), ``output`` accumulators reuse the ``$group`` compiler.
    Out-of-bounds documents take ``default`` when given, else the
    aggregation errors — Mongo's exact semantics, reproduced
    distributed via ``raise_error`` in the otherwise-branch (a planning
    -time check cannot know the data). A string ``default`` against
    numeric boundaries coerces every label to string (Mongo's _id is
    schemaless; one Spark column needs one type — documented
    deviation, value-preserving)."""
    missing = [k for k in ("groupBy", "boundaries") if k not in spec]
    if missing:
        raise ValueError(f"$bucket spec missing required "
                         f"field(s): {missing}")
    bounds = spec["boundaries"]
    # STRICTLY increasing, Mongo's rule: a duplicated boundary ([0, 10,
    # 10, 20]) would pass a sorted() check but yield an unreachable
    # empty bucket whose values silently fall to default/raise_error
    if len(bounds) < 2 or not all(a < b for a, b in zip(bounds, bounds[1:])):
        raise ValueError(
            "$bucket boundaries must be strictly increasing, length >= 2")
    gb = _expr(spec["groupBy"])
    has_default = "default" in spec
    stringify = has_default and isinstance(spec["default"], str) \
        and not all(isinstance(b, str) for b in bounds)

    def lab(v):
        return F.lit(str(v) if stringify else v)

    out = F.when((gb >= F.lit(bounds[0])) & (gb < F.lit(bounds[1])),
                 lab(bounds[0]))
    for lo, hi in zip(bounds[1:-1], bounds[2:]):
        out = out.when((gb >= F.lit(lo)) & (gb < F.lit(hi)), lab(lo))
    if has_default:
        out = out.otherwise(lab(spec["default"]))
    else:
        out = out.otherwise(F.raise_error(F.lit(
            "$bucket: value outside boundaries and no default")))
    tmp = "__bucket"
    grouped = _group(df.withColumn(tmp, out),
                     {"_id": f"${tmp}",
                      **spec.get("output", {"count": {"$sum": 1}})})
    return grouped


_WF_RANK = {"$rank": F.rank, "$denseRank": F.dense_rank,
            "$documentNumber": F.row_number}


def _wf_bound(v, lower: bool, scale_ms: int | None = None):
    from pyspark.sql import Window

    if v == "unbounded":
        return Window.unboundedPreceding if lower \
            else Window.unboundedFollowing
    if v == "current":
        return Window.currentRow
    if scale_ms is not None:
        # time-unit range bound: N units -> milliseconds on the epoch-ms
        # order key (fixed-width units only; rounding covers fractional
        # bound values like 1.5 hours)
        return int(round(float(v) * scale_ms))
    return int(v)


#: Fixed-width $setWindowFields range units -> milliseconds.
_WF_UNIT_MS = {"week": 604_800_000, "day": 86_400_000,
               "hour": 3_600_000, "minute": 60_000,
               "second": 1_000, "millisecond": 1}

#: Calendar $setWindowFields range units -> months. These have no fixed
#: millisecond width; they lower onto a months-since-epoch sort key
#: instead (see the calendar branch in _set_window_fields).
_WF_UNIT_MONTHS = {"month": 1, "quarter": 3, "year": 12}


def _wf_month_bound(v, lower: bool, scale: int):
    from pyspark.sql import Window

    if v == "unbounded":
        return Window.unboundedPreceding if lower \
            else Window.unboundedFollowing
    if v == "current":
        return Window.currentRow
    if float(v) != int(v):
        raise ValueError(
            f"calendar range bound must be an integer, got {v!r}")
    return int(v) * scale


def _warn_whole_collection_window(df: DataFrame, stage: str) -> None:
    """A window/series stage without ``partitionBy`` is Mongo's own
    whole-collection semantics — correct, but it lowers to a
    SINGLE-partition plan (Spark logs ``WindowExec: No Partition
    Defined``): one task holds the entire collection, a silent
    bottleneck at scale. Warn by default, naming the stage; set the
    session conf ``spark.mongoql.strictWholeCollectionWindow=true``
    to raise instead (opt-in for pipelines that must never plan a
    one-task stage)."""
    import warnings

    strict = str(df.sparkSession.conf.get(
        "spark.mongoql.strictWholeCollectionWindow", "false"))
    msg = (f"{stage} without partitionBy runs as ONE task over the "
           "whole collection (single-partition window) — fine for "
           "small frames, a scale bottleneck otherwise; add "
           "partitionBy, or set "
           "spark.mongoql.strictWholeCollectionWindow=true to make "
           "this an error")
    if strict.lower() == "true":
        raise ValueError(msg)
    warnings.warn(msg, stacklevel=3)


def _set_window_fields(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$setWindowFields`` (Mongo 5.0 window functions) lowered onto
    Spark's Window: ``partitionBy`` expression, compound ``sortBy``,
    and per-output ``window`` frames — ``documents`` → rowsBetween,
    ``range`` → rangeBetween (single ascending numeric sort key, no
    time ``unit``). Accumulators without an explicit window default to
    the WHOLE partition (Mongo's rule — unlike SQL's default frame
    when ORDER BY is present, so the frame is always set explicitly).
    Rank-family ops require sortBy and take no frame; ``$shift``
    lowers to lead/lag with its default. ``$push`` without sortBy has
    no defined order in Mongo — pinned with sort_array here, the
    translator's determinism convention."""
    from pyspark.sql import Window

    env = _root_env(df)
    part = spec.get("partitionBy")
    if part is None:
        _warn_whole_collection_window(df, "$setWindowFields")
    sortby = spec.get("sortBy") or {}
    base = Window.partitionBy(*([_expr(part, env)] if part is not None else []))
    ordered = base.orderBy(
        *[F.col(k).asc() if d == 1 else F.col(k).desc()
          for k, d in sortby.items()]) if sortby else base
    for name, wspec in spec["output"].items():
        if "." in name:
            raise ValueError(
                f"$setWindowFields nested output path unsupported: {name}")
        wspec = dict(wspec)
        frame = wspec.pop("window", None)
        (op, arg), = wspec.items()
        if op in _WF_RANK:
            if not sortby:
                raise ValueError(f"{op} requires sortBy")
            if frame is not None:
                raise ValueError(f"{op} does not accept a window")
            df = df.withColumn(name, _WF_RANK[op]().over(ordered))
            continue
        if op == "$shift":
            if not sortby:
                raise ValueError("$shift requires sortBy")
            by = int(arg.get("by", 1))
            default = arg.get("default")
            fn = F.lead if by >= 0 else F.lag
            df = df.withColumn(name, fn(_expr(arg["output"], env), abs(by),
                                        default).over(ordered))
            continue
        if op in ("$locf", "$linearFill"):
            # gap-filling window operators (Mongo 5.2) — no frame spec
            # in Mongo; $locf is one running ignore-nulls window,
            # $linearFill brackets each null with its nearest non-null
            # neighbors on the sort key (same lowering as the $fill
            # stage, per-output here)
            if not sortby:
                raise ValueError(f"{op} requires sortBy")
            if frame is not None:
                raise ValueError(f"{op} does not accept a window")
            y = _expr(arg, env)
            if op == "$locf":
                df = df.withColumn(name, F.last(y, ignorenulls=True).over(
                    ordered.rowsBetween(Window.unboundedPreceding, 0)))
                continue
            if len(sortby) != 1 or next(iter(sortby.values())) != 1:
                raise ValueError(
                    "$linearFill needs a single ascending sortBy")
            key = _sort_key_double(df, next(iter(sortby)))
            before = ordered.rowsBetween(Window.unboundedPreceding, -1)
            after = ordered.rowsBetween(1, Window.unboundedFollowing)
            pv = F.last(y, ignorenulls=True).over(before)
            pk = F.last(F.when(y.isNotNull(), key),
                        ignorenulls=True).over(before)
            nv = F.first(y, ignorenulls=True).over(after)
            nk = F.first(F.when(y.isNotNull(), key),
                         ignorenulls=True).over(after)
            interp = pv + (nv - pv) * (key - pk) / (nk - pk)
            df = df.withColumn(name, F.coalesce(
                y.cast("double"),
                F.when(pv.isNotNull() & nv.isNotNull(), interp)))
            continue
        # accumulator over a frame
        w = ordered if sortby else base
        unit = None
        if frame is None:
            lo, hi = "unbounded", "unbounded"
            kind = "documents"
        else:
            unit = frame.get("unit")
            kinds = [k for k in frame if k != "unit"]
            if len(kinds) != 1:
                raise ValueError(
                    f"window needs exactly one frame kind, got: {frame}")
            kind = kinds[0]
            lo, hi = frame[kind]
            if unit is not None and kind != "range":
                raise ValueError("window 'unit' applies to range frames")
        if kind == "documents":
            w = w.rowsBetween(_wf_bound(lo, True), _wf_bound(hi, False))
        elif kind == "range":
            if len(sortby) != 1 or next(iter(sortby.values())) != 1:
                raise ValueError(
                    "range window needs a single ascending sortBy")
            if unit is not None:
                # time-unit range (Mongo 5.0: trailing-N-days windows):
                # order by the sort field's epoch MILLISECONDS and turn
                # the [lo, hi] unit offsets into ms — rangeBetween takes
                # integer deltas, so the frame stays a native Spark
                # running-window (no self-join, no UDF). Millisecond
                # resolution: sub-ms timestamp components are truncated
                # from the ORDER KEY only (output rows keep full
                # precision); fixed-width units only — year/quarter/
                # month vary in length and raise.
                sort_field = next(iter(sortby))
                scale = _WF_UNIT_MS.get(unit)
                if scale is not None:
                    # TIMESTAMP_NTZ cannot cast straight to a number —
                    # via timestamp; double epoch seconds keep ~0.4 us
                    # precision for current epochs, exact at ms grain
                    key = (F.col(sort_field).cast("timestamp")
                           .cast("double") * 1000).cast("long")
                    w = base.orderBy(key.asc()).rangeBetween(
                        _wf_bound(lo, True, scale),
                        _wf_bound(hi, False, scale))
                elif unit in _WF_UNIT_MONTHS:
                    # CALENDAR range (Mongo 5.0: trailing-N-month/
                    # quarter/year windows): months have no fixed ms
                    # width, so the frame runs on a MONTHS-SINCE-EPOCH
                    # integer key. Exact Mongo parity holds only when
                    # every sort value is month-aligned (Mongo anchors
                    # the boundary at the current doc's day-of-month;
                    # a constant-width Spark frame cannot follow that
                    # for mid-month values) — so alignment is ENFORCED
                    # per row with raise_error inside the key
                    # expression (distributed, zero extra pass, the
                    # $bucket contract pattern). Trailing-N-month
                    # pipelines are post-aggregation monthly series in
                    # practice — $dateTrunc the sort field first.
                    ts = F.col(sort_field).cast("timestamp")
                    months = ((F.year(ts) - F.lit(1970)) * 12
                              + F.month(ts) - 1).cast("long")
                    key = F.when(
                        ts.eqNullSafe(F.date_trunc("month", ts)), months
                    ).otherwise(F.raise_error(F.concat(
                        F.lit(f"calendar range unit {unit!r} needs "
                              f"month-aligned sort values; $dateTrunc "
                              f"'{sort_field}' first — got "),
                        ts.cast("string"))))
                    mscale = _WF_UNIT_MONTHS[unit]
                    w = base.orderBy(key.asc()).rangeBetween(
                        _wf_month_bound(lo, True, mscale),
                        _wf_month_bound(hi, False, mscale))
                else:
                    raise ValueError(
                        f"unsupported $setWindowFields range unit: "
                        f"{unit!r} (supported: "
                        f"{sorted(_WF_UNIT_MS) + sorted(_WF_UNIT_MONTHS)})")
            else:
                w = w.rangeBetween(_wf_bound(lo, True), _wf_bound(hi, False))
        else:
            raise ValueError(f"unsupported window kind: {kind}")
        if op == "$integral":
            # trapezoidal integral over the frame (Mongo 5.0): per-row
            # increment = Δsort-key × mean of the adjacent values, via
            # lag over the SAME ordered partition (Spark chains the two
            # Window operators on one exchange — no extra shuffle),
            # then ONE frame sum minus the frame's first increment
            # (that increment pairs with a point outside the frame).
            # A single-point frame integrates to 0.
            if len(sortby) != 1 or next(iter(sortby.values())) != 1:
                raise ValueError(
                    "$integral needs a single ascending sortBy")
            y = _expr(arg["input"], env)
            kcol = F.col(next(iter(sortby)))
            iunit = arg.get("unit")
            if iunit is not None:
                if iunit not in _WF_UNIT_MS:
                    raise ValueError(
                        f"unsupported $integral unit: {iunit!r}")
                k = (kcol.cast("timestamp").cast("double") * 1000) \
                    / float(_WF_UNIT_MS[iunit])
            else:
                k = kcol.cast("double")
            incr = F.coalesce(
                (k - F.lag(k, 1).over(ordered))
                * (y + F.lag(y, 1).over(ordered)) / 2, F.lit(0.0))
            tmpc = f"__intg_{name}"
            df = (df.withColumn(tmpc, incr)
                  .withColumn(name, F.sum(tmpc).over(w)
                              - F.first(tmpc).over(w))
                  .drop(tmpc))
            continue
        if op == "$expMovingAvg":
            # ema_i = α·x_i + (1-α)·ema_{i-1}, ema_0 = x_0 — an
            # inherently sequential recurrence, lowered EXACTLY as one
            # groupBy(partition) + JVM-side higher-order fold: collect
            # each partition's docs sorted by the sortBy key, fold the
            # EMA array left-to-right with F.aggregate (the same flop
            # order as Mongo's cursor walk, so results are bit-identical
            # to a sequential engine — no prefix-sum reassociation, no
            # β^-j overflow), then explode back to rows. O(partition)
            # memory — the same bound Mongo itself puts on
            # $setWindowFields partitions and this module documents for
            # the rank accumulators. Contract (r15 — deterministic
            # superset of Mongo's unspecified cases): sortBy ties
            # break by (input, doc) for determinism where Mongo is
            # unspecified; a null input emits null and does NOT advance
            # the EMA state.
            if not sortby or len(sortby) != 1 \
                    or next(iter(sortby.values())) != 1:
                raise ValueError(
                    "$expMovingAvg needs a single ascending sortBy")
            if frame is not None:
                raise ValueError("$expMovingAvg does not accept a window")
            if "N" in arg:
                alpha = 2.0 / (int(arg["N"]) + 1)
            elif "alpha" in arg:
                alpha = float(arg["alpha"])
            else:
                raise ValueError("$expMovingAvg needs N or alpha")
            skey = next(iter(sortby))
            x = _expr(arg["input"], env).cast("double")
            doc = F.struct(*[F.col(c) for c in df.columns])
            pcols = ([_expr(part, env).alias("__p")]
                     if part is not None else [])
            arr = F.sort_array(F.collect_list(F.struct(
                F.col(skey).alias("__k"), x.alias("__x"),
                doc.alias("__d"))))
            zero = F.struct(
                F.lit(None).cast("double").alias("prev"),
                F.array().cast("array<double>").alias("out"))

            def _ema_step(acc, s):
                xi = s["__x"]
                nxt = (F.when(xi.isNull(), acc["prev"])
                       .when(acc["prev"].isNull(), xi)
                       .otherwise(F.lit(alpha) * xi
                                  + F.lit(1.0 - alpha) * acc["prev"]))
                return F.struct(
                    nxt.alias("prev"),
                    F.concat(acc["out"],
                             F.array(F.when(xi.isNotNull(), nxt))
                             ).alias("out"))

            g = (df.groupBy(*pcols).agg(arr.alias("__arr"))
                 .withColumn("__ema", F.aggregate(
                     "__arr", zero, _ema_step, lambda a: a["out"])))
            df = (g.select(F.explode(F.arrays_zip("__arr", "__ema"))
                           .alias("__z"))
                  .select(F.col("__z.__arr.__d.*"),
                          F.col("__z.__ema").alias(name)))
            env = _root_env(df)
            continue
        if op == "$derivative":
            # average rate of change over the frame: (Δoutput / Δsort
            # key), the key delta optionally scaled to a time unit —
            # first/last over the SAME frame, so it stays one Window op
            if len(sortby) != 1 or next(iter(sortby.values())) != 1:
                raise ValueError(
                    "$derivative needs a single ascending sortBy")
            y = _expr(arg["input"], env)
            kcol = F.col(next(iter(sortby)))
            dy = F.last(y).over(w) - F.first(y).over(w)
            dunit = arg.get("unit")
            if dunit:
                if dunit not in _WF_UNIT_MS:
                    raise ValueError(
                        f"unsupported $derivative unit: {dunit!r}")
                kms = (kcol.cast("timestamp").cast("double") * 1000)
                dx = (F.last(kms).over(w) - F.first(kms).over(w)) \
                    / F.lit(_WF_UNIT_MS[dunit])
            else:
                dx = F.last(kcol).over(w) - F.first(kcol).over(w)
            # a single-point frame has Δkey = 0: no rate exists — NULL
            # (try_divide), never an ANSI divide-by-zero abort
            df = df.withColumn(name, F.try_divide(dy, dx))
            continue
        if op in ("$minN", "$maxN", "$firstN", "$lastN"):
            # slice/sort wrap the window AGGREGATE's result, so .over
            # binds on the collect, not the wrapper
            lst = F.collect_list(_expr(arg["input"], env)).over(w)
            n = int(arg["n"])
            if op in ("$minN", "$maxN"):
                out_col = F.slice(F.sort_array(lst, op == "$minN"), 1, n)
            elif op == "$firstN":
                # frame order IS the window order (collect_list over an
                # ordered frame preserves it); lastN takes the tail
                out_col = F.slice(lst, 1, n)
            else:
                out_col = F.reverse(F.slice(F.reverse(lst), 1, n))
            df = df.withColumn(name, out_col)
            continue
        if op == "$sum" and arg == 1:
            c = F.count(F.lit(1))
        elif op == "$count":
            c = F.count(F.lit(1))
        elif op == "$sum":
            c = F.sum(_expr(arg, env))
        elif op == "$avg":
            c = F.avg(_expr(arg, env))
        elif op == "$min":
            c = F.min(_expr(arg, env))
        elif op == "$max":
            c = F.max(_expr(arg, env))
        elif op == "$stdDevPop":
            c = F.stddev_pop(_expr(arg, env))
        elif op == "$stdDevSamp":
            c = F.stddev_samp(_expr(arg, env))
        elif op == "$first":
            c = F.first(_expr(arg, env))
        elif op == "$last":
            c = F.last(_expr(arg, env))
        elif op == "$push":
            c = F.collect_list(_expr(arg, env)) if sortby \
                else F.sort_array(F.collect_list(_expr(arg, env)))
        elif op == "$addToSet":
            c = F.sort_array(F.collect_set(_expr(arg, env)))
        elif op in ("$covariancePop", "$covarianceSamp"):
            a1, a2 = _expr(arg[0]), _expr(arg[1])
            c = (F.covar_pop if op == "$covariancePop"
                 else F.covar_samp)(a1, a2)
        elif op in ("$median", "$percentile"):
            # exact distributed percentile over the frame (Mongo 7.0's
            # t-digest method replaced by the deterministic exact form
            # — the same documented CONTRACT as the $group accumulator:
            # exact is inside every t-digest error envelope, r15)
            y = _expr(arg["input"], env)
            c = (F.percentile(y, F.lit(0.5)) if op == "$median"
                 else F.percentile(y, F.lit([float(p)
                                             for p in arg["p"]])))
        else:
            raise ValueError(
                f"unsupported $setWindowFields operator: {op}")
        df = df.withColumn(name, c.over(w))
    return df


def _sort_key_double(df: DataFrame, field: str) -> Column:
    """Numeric (double) image of a sort field for interpolation math:
    TIMESTAMP_NTZ cannot cast straight to a number — route via
    timestamp (epoch seconds); numerics cast directly."""
    from pyspark.sql import types as ST

    c = F.col(field)
    dt = _field_type(df.schema, field)
    if isinstance(dt, (ST.TimestampNTZType, ST.DateType)):
        c = c.cast("timestamp")
    return c.cast("double")


def _fill(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$fill`` (Mongo 5.3): constant, last-observation-carried-forward
    and linear-interpolation null filling. ``value`` fills lower to
    coalesce; ``locf`` is one running ignore-nulls window; ``linear``
    brackets each null with the nearest non-null neighbors (two
    ignore-nulls windows) and interpolates on the sort key — all native
    window expressions, no self-join, no UDF. Without ``partitionBy``
    the window is global, same caveat as Mongo (partition for scale)."""
    from pyspark.sql import Window

    parts: list[Column] = []
    if spec.get("partitionBy") is not None:
        parts = [_expr(spec["partitionBy"])]
    elif spec.get("partitionByFields"):
        parts = [F.col(c) for c in spec["partitionByFields"]]
    elif any("value" not in how for how in spec["output"].values()):
        # constant-value fills are pure coalesce (no window) — only
        # locf/linear methods plan the whole-collection window
        _warn_whole_collection_window(df, "$fill")
    sortby = spec.get("sortBy") or {}
    order = [F.col(k).asc() if d == 1 else F.col(k).desc()
             for k, d in sortby.items()]
    for name, how in spec["output"].items():
        if "." in name:
            raise ValueError(f"$fill nested output path unsupported: {name}")
        if "value" in how:
            df = df.withColumn(
                name, F.coalesce(F.col(name), _expr(how["value"]))
                if name in df.columns else _expr(how["value"]))
            continue
        method = how.get("method")
        if not sortby:
            raise ValueError(f"$fill method {method!r} requires sortBy")
        w = Window.partitionBy(*parts).orderBy(*order)
        if method == "locf":
            df = df.withColumn(name, F.last(name, ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
        elif method == "linear":
            if len(sortby) != 1 or next(iter(sortby.values())) != 1:
                raise ValueError(
                    "$fill linear needs a single ascending sortBy")
            key = _sort_key_double(df, next(iter(sortby)))
            before = w.rowsBetween(Window.unboundedPreceding, -1)
            after = w.rowsBetween(1, Window.unboundedFollowing)
            pv = F.last(F.col(name), ignorenulls=True).over(before)
            pk = F.last(F.when(F.col(name).isNotNull(), key),
                        ignorenulls=True).over(before)
            nv = F.first(F.col(name), ignorenulls=True).over(after)
            nk = F.first(F.when(F.col(name).isNotNull(), key),
                         ignorenulls=True).over(after)
            interp = pv + (nv - pv) * (key - pk) / (nk - pk)
            # Mongo: unbracketed nulls (before the first / after the
            # last observation) stay null
            df = df.withColumn(name, F.coalesce(
                F.col(name).cast("double"),
                F.when(pv.isNotNull() & nv.isNotNull(), interp)))
        else:
            raise ValueError(f"unsupported $fill method: {method!r}")
    return df


#: $densify/$dateAdd-style calendar steps -> (make_ym_interval years,
#: months); fixed-width steps -> make_dt_interval(days, hours, mins, secs)
_DENSIFY_DT = {"week": (7, 0, 0, 0), "day": (1, 0, 0, 0),
               "hour": (0, 1, 0, 0), "minute": (0, 0, 1, 0),
               "second": (0, 0, 0, 1), "millisecond": (0, 0, 0, 0.001)}
_DENSIFY_YM = {"year": (1, 0), "quarter": (0, 3), "month": (0, 1)}


def _densify(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$densify`` (Mongo 5.1): add rows on a fixed grid where the
    field has gaps. The grid derives from one aggregate (global min/max
    for ``bounds: "full"``, per-partition for ``"partition"``, literals
    for ``[lo, hi)``), explodes a ``sequence`` per partition, and
    anti-joins existing field values — grid size is data-bounded,
    non-field columns come back NULL (Mongo's behavior). Time units use
    interval steps (calendar units included — sequence handles
    year-month intervals natively)."""
    missing = [k for k in ("field", "range") if k not in spec]
    if missing:
        raise ValueError(f"$densify spec missing required "
                         f"field(s): {missing}")
    f = spec["field"]
    if "." in f:
        raise ValueError("$densify nested field unsupported")
    rng = spec["range"]
    step, unit, bounds = rng["step"], rng.get("unit"), rng["bounds"]
    parts = list(spec.get("partitionByFields") or [])
    if not parts:
        _warn_whole_collection_window(df, "$densify")
    if unit is None:
        step_col = F.lit(step)
    elif unit in _DENSIFY_DT:
        d, h, m, s = (v * step for v in _DENSIFY_DT[unit])
        step_col = F.make_dt_interval(F.lit(d), F.lit(h), F.lit(m),
                                      F.lit(s))
    elif unit in _DENSIFY_YM:
        y, m = (v * step for v in _DENSIFY_YM[unit])
        step_col = F.make_ym_interval(F.lit(y), F.lit(m))
    else:
        raise ValueError(f"unsupported $densify unit: {unit!r}")
    explicit = isinstance(bounds, (list, tuple))
    if explicit:
        lo = F.lit(bounds[0]).cast(df.schema[f].dataType)
        hi = F.lit(bounds[1]).cast(df.schema[f].dataType)
        base = (df.select(*parts).distinct() if parts
                else df.sparkSession.range(1).select())
        base = base.select(*parts, lo.alias("__lo"), hi.alias("__hi"))
    elif bounds == "full":
        agg = df.agg(F.min(f).alias("__lo"), F.max(f).alias("__hi"))
        base = (df.select(*parts).distinct().crossJoin(agg) if parts
                else agg)
    elif bounds == "partition":
        if not parts:
            raise ValueError(
                "$densify bounds 'partition' needs partitionByFields")
        base = df.groupBy(*parts).agg(F.min(f).alias("__lo"),
                                      F.max(f).alias("__hi"))
    else:
        raise ValueError(f"unsupported $densify bounds: {bounds!r}")
    seq = F.sequence(F.col("__lo"), F.col("__hi"), step_col)
    grid = base.select(*parts, F.explode(seq).alias(f))
    if explicit:
        # Mongo's explicit bounds are half-open [lo, hi)
        grid = grid.filter(F.col(f) < hi)
    # NULL-SAFE anti join: a using-columns join is null-unsafe, so rows
    # whose partitionByFields value is NULL would never match and the
    # grid would re-insert values that already exist in the null
    # partition — build the condition with eqNullSafe instead
    exist = df.select(*parts, f).dropDuplicates(parts + [f]).alias("__dex")
    galias = grid.alias("__dgr")
    cond = None
    for c in parts + [f]:
        eq = F.col(f"__dgr.{c}").eqNullSafe(F.col(f"__dex.{c}"))
        cond = eq if cond is None else cond & eq
    new_rows = galias.join(exist, cond, "left_anti")
    return df.unionByName(new_rows, allowMissingColumns=True)


#: $bucketAuto granularity preferred-number series (Renard / 1-2-5 /
#: E-series bases; POWERSOF2 handled analytically in _gran_round).
_GRAN_SERIES = {
    "R5": [1.0, 1.6, 2.5, 4.0, 6.3],
    "R10": [1.0, 1.25, 1.6, 2.0, 2.5, 3.15, 4.0, 5.0, 6.3, 8.0],
    "R20": [1.0, 1.12, 1.25, 1.4, 1.6, 1.8, 2.0, 2.24, 2.5, 2.8, 3.15,
            3.55, 4.0, 4.5, 5.0, 5.6, 6.3, 7.1, 8.0, 9.0],
    "R40": [1.0, 1.06, 1.12, 1.18, 1.25, 1.32, 1.4, 1.5, 1.6, 1.7, 1.8,
            1.9, 2.0, 2.12, 2.24, 2.36, 2.5, 2.65, 2.8, 3.0, 3.15, 3.35,
            3.55, 3.75, 4.0, 4.25, 4.5, 4.75, 5.0, 5.3, 5.6, 6.0, 6.3,
            6.7, 7.1, 7.5, 8.0, 8.5, 9.0, 9.5],
    "1-2-5": [1.0, 2.0, 5.0],
    "E6": [1.0, 1.5, 2.2, 3.3, 4.7, 6.8],
    "E12": [1.0, 1.2, 1.5, 1.8, 2.2, 2.7, 3.3, 3.9, 4.7, 5.6, 6.8, 8.2],
    "E24": [1.0, 1.1, 1.2, 1.3, 1.5, 1.6, 1.8, 2.0, 2.2, 2.4, 2.7, 3.0,
            3.3, 3.6, 3.9, 4.3, 4.7, 5.1, 5.6, 6.2, 6.8, 7.5, 8.2, 9.1],
}


def _gran_round(x: float, series: str, up: bool) -> float:
    """Preferred-number rounding, Mongo's GranularityRounder contract:
    ``up`` returns the series value STRICTLY greater than x, ``down``
    the one strictly less (a value already on a series number still
    moves to its neighbor — Mongo's rounder behaves this way so bucket
    boundaries always separate); 0 maps to 0, negatives raise (the
    documented granularity restriction)."""
    import math

    if x == 0:
        return 0.0
    if x < 0:
        raise ValueError(
            "$bucketAuto granularity requires non-negative values")
    tol = 1e-9
    if series == "POWERSOF2":
        e = math.log2(x)
        k = (math.floor(e + tol) + 1) if up else (math.ceil(e - tol) - 1)
        return float(2.0 ** k)
    base = _GRAN_SERIES[series]
    k = int(math.floor(math.log10(x)))
    cands = sorted(b * (10.0 ** p) for p in (k - 1, k, k + 1)
                   for b in base)
    if up:
        return next(c for c in cands if c > x * (1 + tol))
    prev = cands[0] / 10.0
    for c in cands:
        if c < x * (1 - tol):
            prev = c
        else:
            break
    return prev


def _bucket_auto(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$bucketAuto``: ~equal-population buckets. Boundaries are exact
    percentiles of the groupBy expression (ONE distributed sort-based
    aggregate; the driver sees only the <=N-1 boundary scalars plus the
    global min/max), then assignment is a branch-free running
    comparison — no global row_number window, so the stage scales like
    any groupBy. With ``granularity``, each percentile boundary rounds
    UP to the preferred-number series and the first bucket's min rounds
    DOWN (driver-side math on the scalars; _gran_round), ``_id`` bounds
    become the rounded series values and buckets absorb Mongo-style
    (collapsed boundaries just mean fewer buckets). Deviations,
    documented: without granularity, boundaries interpolate between
    data points (Mongo picks data values) and ``_id`` bounds are each
    bucket's observed min/max (closed), where Mongo's upper bound is
    the next bucket's lower. Null groupBy values land in the first
    bucket, as in Mongo."""
    gran = spec.get("granularity")
    if gran is not None and gran != "POWERSOF2" \
            and gran not in _GRAN_SERIES:
        raise ValueError(
            f"unsupported $bucketAuto granularity {gran!r} (supported: "
            f"{sorted(_GRAN_SERIES) + ['POWERSOF2']})")
    gb = _expr(spec["groupBy"])
    n = int(spec["buckets"])
    if n < 1:
        raise ValueError("$bucketAuto needs buckets >= 1")
    row = df.select(gb.alias("__g")).agg(
        F.percentile("__g", F.lit([i / n for i in range(1, n)]))
        .alias("bs"),
        F.min("__g").alias("mn"), F.max("__g").alias("mx")).collect()[0]
    bs = sorted({b for b in (row["bs"] or []) if b is not None})
    bounds = None
    if gran is not None and row["mn"] is not None:
        lo = _gran_round(float(row["mn"]), gran, up=False)
        hi = _gran_round(float(row["mx"]), gran, up=True)
        rb = sorted({_gran_round(float(b), gran, up=True) for b in bs})
        bs = [b for b in rb if lo < b < hi]
        bounds = [lo] + bs + [hi]
    idx = F.lit(0)
    for b in bs:
        idx = idx + (gb >= F.lit(b)).cast("int")
    tmp = "__bucket_auto"
    grouped = _group(df.withColumn(tmp, F.coalesce(idx, F.lit(0))),
                     {"_id": f"${tmp}",
                      "__mn": {"$min": spec["groupBy"]},
                      "__mx": {"$max": spec["groupBy"]},
                      **spec.get("output", {"count": {"$sum": 1}})})
    if bounds is not None:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        i = F.col("_id").cast("int")
        return grouped.select(
            F.struct(F.get(arr, i).alias("min"),
                     F.get(arr, i + 1).alias("max")).alias("_id"),
            *[c for c in grouped.columns
              if c not in ("_id", "__mn", "__mx")])
    return grouped.select(
        F.struct(F.col("__mn").alias("min"),
                 F.col("__mx").alias("max")).alias("_id"),
        *[c for c in grouped.columns if c not in ("_id", "__mn", "__mx")])


_REDACT_VARS = {"KEEP": "keep", "PRUNE": "prune", "DESCEND": "descend"}


def _rebase_refs(v: Any, schema, var: str) -> Any:
    """Rewrite bare ``$path`` field references so an expression written
    against "the current document" evaluates against an arbitrary
    struct column instead: ``$a.b`` becomes ``$$var.a.b`` when the path
    resolves in ``schema``, and a ``{$literal: None}`` when it does not
    (Mongo's missing-field semantics — the expression sees missing, it
    does not error). ``$$...`` variables pass through untouched."""
    from pyspark.sql import types as ST

    if isinstance(v, str) and v.startswith("$") and not v.startswith("$$"):
        node = schema
        for part in v[1:].split("."):
            if not isinstance(node, ST.StructType) or part not in node.names:
                return {"$literal": None}
            node = node[part].dataType
        return f"$${var}." + v[1:]
    if isinstance(v, dict):
        return {k: _rebase_refs(x, schema, var) for k, x in v.items()}
    if isinstance(v, list):
        return [_rebase_refs(x, schema, var) for x in v]
    return v


def _redact(df: DataFrame, spec: Any) -> DataFrame:
    """``$redact``: per-document recursive access control. The
    expression evaluates at EVERY document level to ``$$KEEP`` (keep
    this subtree wholesale), ``$$PRUNE`` (drop it), or ``$$DESCEND``
    (keep this level's scalars, recurse into embedded documents and
    arrays of documents). Mongo walks runtime documents; a rectangular
    engine walks the SCHEMA once at plan time instead — the decision
    tree compiles to nested CASE/transform column expressions (codegen,
    no Python, no explode), recursion bounded by schema depth:

    - root PRUNE     -> the row filters out;
    - struct field   -> re-evaluate the expression with refs REBASED to
      the subdocument (:func:`_rebase_refs`; missing fields read as
      null, Mongo's rule): PRUNE nulls the field, KEEP passes it
      through, DESCEND rebuilds it field-by-field recursively;
    - array<struct>  -> per-element decision inside filter()+transform();
    - scalars/arrays-of-scalars under DESCEND are kept (Mongo keeps
      non-document values).

    Deviation, documented: a PRUNEd field/element becomes NULL / is
    removed from the array — a missing field and a null field are the
    same thing in a rectangular schema."""
    from pyspark.sql import types as ST

    env = {k: F.lit(v) for k, v in _REDACT_VARS.items()}

    def decision(base: Column | None, schema) -> Column:
        if base is None:
            return _expr(spec, env).cast("string")
        rebased = _rebase_refs(spec, schema, "__doc")
        return _expr(rebased, {**env, "__doc": base}).cast("string")

    def rebuild(base: Column, dtype: ST.StructType) -> Column:
        """The DESCEND body for one document level: keep scalars,
        decide recursively for embedded docs and doc arrays."""
        fields = []
        for f in dtype.fields:
            col = base[f.name]
            if isinstance(f.dataType, ST.StructType):
                d = decision(col, f.dataType)
                fields.append(
                    F.when(d == "prune",
                           F.lit(None).cast(f.dataType))
                    .when(d == "descend", rebuild(col, f.dataType))
                    .otherwise(col).alias(f.name))
            elif isinstance(f.dataType, ST.ArrayType) \
                    and isinstance(f.dataType.elementType, ST.StructType):
                et = f.dataType.elementType

                def make_elem(et):
                    # factory keeps the HOF lambda single-arg —
                    # F.transform dispatches on arity, so a bound
                    # default would receive the element INDEX
                    def elem(e):
                        d = decision(e, et)
                        return (F.when(d == "prune",
                                       F.lit(None).cast(et))
                                .when(d == "descend", rebuild(e, et))
                                .otherwise(e))
                    return elem

                kept = F.filter(F.transform(col, make_elem(et)),
                                lambda e: e.isNotNull())
                fields.append(kept.alias(f.name))
            else:
                fields.append(col.alias(f.name))
        return F.struct(*fields)

    root = decision(None, df.schema)
    df = df.filter(F.coalesce(root != "prune", F.lit(False)))
    root2 = decision(None, df.schema)  # re-evaluate post-filter
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, ST.StructType) \
                or (isinstance(f.dataType, ST.ArrayType)
                    and isinstance(f.dataType.elementType, ST.StructType)):
            whole = F.struct(*[F.col(c).alias(c) for c in df.columns])
            built = rebuild(whole, df.schema)[f.name]
            cols.append(F.when(root2 == "keep", F.col(f.name))
                        .otherwise(built).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _mentions_pipeline_var(v: Any) -> bool:
    """True if any string in the (nested) expression references a ``$$``
    pipeline variable — the conservative correlation detector for
    ``$lookup`` sub-pipelines (a HOF-bound ``$$this`` also trips it;
    that over-approximation only narrows the supported subset, never
    silently mis-joins)."""
    if isinstance(v, str):
        return v.startswith("$$")
    if isinstance(v, dict):
        return any(_mentions_pipeline_var(x) for x in v.values())
    if isinstance(v, list):
        return any(_mentions_pipeline_var(x) for x in v)
    return False


def _mentions_vars(v: Any, names: set[str]) -> bool:
    """True if any ``$$var`` reference in the (nested) spec names one of
    ``names`` — the targeted let-var detector (HOF-bound ``$$this``/
    ``$$value`` don't trip it, unlike :func:`_mentions_pipeline_var`)."""
    if isinstance(v, str) and v.startswith("$$"):
        return v[2:].partition(".")[0] in names
    if isinstance(v, dict):
        return any(_mentions_vars(x, names) for x in v.values())
    if isinstance(v, list):
        return any(_mentions_vars(x, names) for x in v)
    return False


def _subst_let_refs(v: Any, mapping: dict[str, str]) -> Any:
    """Rewrite ``$$var[.path]`` references to ``$column[.path]`` field
    references per ``mapping`` — how the general correlated-$lookup
    path turns let variables into plain joined columns. HOF-bound
    variables (``$$this`` etc., absent from the mapping) pass through
    untouched."""
    if isinstance(v, str) and v.startswith("$$"):
        name, _, rest = v[2:].partition(".")
        if name in mapping:
            return "$" + mapping[name] + (("." + rest) if rest else "")
        return v
    if isinstance(v, dict):
        return {k: _subst_let_refs(x, mapping) for k, x in v.items()}
    if isinstance(v, list):
        return [_subst_let_refs(x, mapping) for x in v]
    return v


def _split_lookup_correlation(expr: Any, let_vars: set[str]):
    """Decompose a correlated ``$lookup`` leading ``$match`` ``$expr``
    into (a) equality JOIN PAIRS ``(let_var, foreign_field)`` from
    ``{$eq: ["$$var", "$field"]}`` conjuncts (either operand order),
    (b) plain NON-correlated conjuncts (foreign-side filter), and
    (c) correlated NON-equi conjuncts (e.g. ``{$gt: ["$qty",
    "$$min"]}``) — those force the general distinct-let-tuples path,
    where they become ordinary post-join filters. At least one equality
    pair is required (it bounds the join; without one the correlation
    is a cross product — raise with guidance)."""
    conjs = (expr["$and"] if isinstance(expr, dict) and set(expr) == {"$and"}
             else [expr])
    pairs, plain, corr = [], [], []
    for c in conjs:
        pair = None
        if (isinstance(c, dict) and set(c) == {"$eq"}
                and isinstance(c["$eq"], list) and len(c["$eq"]) == 2):
            a, b = c["$eq"]
            for x, y in ((a, b), (b, a)):
                if (isinstance(x, str) and x.startswith("$$")
                        and "." not in x[2:] and x[2:] in let_vars
                        and isinstance(y, str) and y.startswith("$")
                        and not y.startswith("$$")):
                    pair = (x[2:], y[1:])
                    break
        if pair is not None:
            pairs.append(pair)
        elif _mentions_vars(c, let_vars):
            corr.append(c)
        else:
            plain.append(c)
    if not pairs:
        raise ValueError(
            "$lookup with let: the pipeline's first $match $expr has no "
            "{$eq: ['$$var', '$field']} conjunct to join on — at least "
            "one equality is needed to bound the correlation (pure "
            "non-equi correlation is a cross product)")
    return pairs, plain, corr


def _split_term_sort_limit(stages: list[dict[str, Any]]):
    """Split a correlated-$lookup sub-pipeline's TERMINAL ``$sort``
    [+ ``$skip``] [+ ``$limit``] suffix — Mongo's 'latest matching doc
    per outer document' idiom and its ``$sort+$skip+$limit`` pagination
    cousin. Per-document scope makes these a per-KEY ordered
    top-k-after-offset, which lowers to one ``array_sort`` (custom
    comparator, multi-field asc/desc with BSON null-first ordering)
    + ``slice`` on the packed array — never a global sort/skip/limit.
    A terminal ``$skip``/``$limit`` WITHOUT ``$sort`` orders by Mongo's
    natural (undefined) order — refused, the translator's determinism
    contract. Only the pipeline order ``$sort, $skip, $limit`` is
    recognized (``$limit`` before ``$skip`` truncates BEFORE the offset
    — a different result Mongo users rarely mean; it falls through to
    the per-document scope guard)."""
    stages = list(stages)
    limit = None
    if stages and isinstance(stages[-1], dict) \
            and set(stages[-1]) == {"$limit"}:
        limit = int(stages[-1]["$limit"])
        stages = stages[:-1]
    skip = None
    if stages and isinstance(stages[-1], dict) \
            and set(stages[-1]) == {"$skip"}:
        skip = int(stages[-1]["$skip"])
        if skip < 0:
            raise ValueError("$skip must be non-negative")
        stages = stages[:-1]
    sort = None
    if stages and isinstance(stages[-1], dict) \
            and set(stages[-1]) == {"$sort"}:
        sort = dict(stages[-1]["$sort"])
        if any("." in f for f in sort):
            raise ValueError(
                "$lookup sub-pipeline $sort on a dotted path is "
                "unsupported — $addFields the value to a top-level "
                "field first")
        stages = stages[:-1]
    if (limit is not None or skip is not None) and sort is None:
        raise ValueError(
            "$lookup sub-pipeline terminal $skip/$limit without $sort "
            "has no defined order (Mongo's natural order is undefined) "
            "— add a $sort so the per-document slice is deterministic "
            "(supported suffix order: $sort, $skip, $limit)")
    return stages, sort, skip, limit


def _bucket_as_group_stages(spec: dict[str, Any]) -> list[dict[str, Any]]:
    """Rewrite a ``$bucket`` spec into ``$addFields`` (the bucket label
    as a ``$switch`` over the boundary intervals) + ``$group`` on that
    label — semantically the stage IS that pair (cf. :func:`_bucket`),
    and the pair composes with the correlated-$lookup terminal-group
    pack where a raw Column cannot. Requires an explicit ``default``:
    Mongo ERRORS on an out-of-bounds value, and inside a decomposed
    join there is no per-document error channel — raising at compile
    time beats a silent null bucket."""
    missing = [k for k in ("groupBy", "boundaries") if k not in spec]
    if missing:
        # bare KeyError here would break the translator's documented
        # ValueError contract for malformed specs (r14 ADVICE)
        raise ValueError(f"$bucket spec missing required "
                         f"field(s): {missing}")
    bounds = spec["boundaries"]
    if len(bounds) < 2 or not all(a < b for a, b in zip(bounds, bounds[1:])):
        raise ValueError(
            "$bucket boundaries must be strictly increasing, length >= 2")
    if "default" not in spec:
        raise ValueError(
            "terminal $bucket in a $lookup sub-pipeline needs an "
            "explicit default — Mongo errors per document on "
            "out-of-bounds values, which a decomposed join cannot "
            "reproduce row-by-row")
    gb = spec["groupBy"]
    stringify = isinstance(spec["default"], str) \
        and not all(isinstance(b, str) for b in bounds)

    def lab(v):
        return {"$literal": str(v) if stringify else v}

    branches = [{"case": {"$and": [{"$gte": [gb, lo]},
                                   {"$lt": [gb, hi]}]},
                 "then": lab(lo)}
                for lo, hi in zip(bounds[:-1], bounds[1:])]
    sw = {"$switch": {"branches": branches, "default": lab(spec["default"])}}
    return [{"$addFields": {"__bucket": sw}},
            {"$group": {"_id": "$__bucket",
                        **spec.get("output", {"count": {"$sum": 1}})}}]


def _augment_partitions(stages: list[dict[str, Any]],
                        key_fields: list[str]) -> list[dict[str, Any]]:
    """Make per-partition stages PER-DOCUMENT inside a correlated
    ``$lookup`` (r14): ``$setWindowFields``/``$fill``/``$densify`` in
    a sub-pipeline are scoped to one outer document's matched docs in
    Mongo; under the join decompilation the same semantics are exact
    once the stage's partition key is EXTENDED by the join/let key
    columns (every partition then is one key's matched set — windows,
    gap fills and grids never leak across documents). ``$densify``
    ``bounds: "full"`` rewrites to ``"partition"``: the per-document
    pipeline's 'full' range IS the per-key range here."""
    out = []
    for st in stages:
        ops = set(st) if isinstance(st, dict) else set()
        if ops == {"$setWindowFields"}:
            spec = dict(st["$setWindowFields"])
            aug: dict[str, Any] = {f"__pk{i}": f"${f}"
                                   for i, f in enumerate(key_fields)}
            if spec.get("partitionBy") is not None:
                aug["__pborig"] = spec["partitionBy"]
            spec["partitionBy"] = aug
            out.append({"$setWindowFields": spec})
        elif ops == {"$densify"}:
            spec = dict(st["$densify"])
            if "range" not in spec:
                # ValueError, the documented malformed-spec error
                # class — not a bare KeyError (r14 ADVICE)
                raise ValueError("$densify spec missing required "
                                 "field: 'range'")
            spec["partitionByFields"] = (
                list(spec.get("partitionByFields") or [])
                + [f for f in key_fields
                   if f not in (spec.get("partitionByFields") or [])])
            rng = dict(spec["range"])
            if rng.get("bounds") == "full":
                rng["bounds"] = "partition"
            spec["range"] = rng
            out.append({"$densify": spec})
        elif ops == {"$fill"}:
            spec = dict(st["$fill"])
            if spec.get("partitionBy") is not None:
                aug = {f"__pk{i}": f"${f}"
                       for i, f in enumerate(key_fields)}
                aug["__pborig"] = spec["partitionBy"]
                spec["partitionBy"] = aug
            else:
                spec["partitionByFields"] = (
                    list(spec.get("partitionByFields") or [])
                    + [f for f in key_fields
                       if f not in (spec.get("partitionByFields") or [])])
            out.append({"$fill": spec})
        else:
            out.append(st)
    return out


def _lookup_sort_cmp(sortspec: dict[str, Any]):
    """array_sort comparator for a Mongo ``$sort`` spec over an array
    of doc structs: fields compared in spec order with ±1 directions,
    nulls ordered FIRST ascending (BSON ranks null below values), and
    a whole-struct comparison as the final tiebreak so equal sort keys
    still pack deterministically (Mongo leaves ties unspecified; the
    translator's determinism convention pins them)."""
    bad = {f: d for f, d in sortspec.items() if int(d) not in (1, -1)}
    if bad:
        # Mongo rejects 0/garbage directions; silently coercing to -1
        # would flip a typo'd order instead of raising (r13 ADVICE)
        raise ValueError(
            f"$sort direction must be 1 or -1, got {bad}")

    def cmp(a: Column, b: Column) -> Column:
        expr = F.when(a < b, -1).when(a > b, 1).otherwise(0)
        for f, d in reversed(list(sortspec.items())):
            d = int(d)
            af, bf = a[f], b[f]
            expr = (F.when(af.isNull() & bf.isNull(), expr)
                    .when(af.isNull(), F.lit(-d))
                    .when(bf.isNull(), F.lit(d))
                    .when(af < bf, F.lit(-d))
                    .when(af > bf, F.lit(d))
                    .otherwise(expr))
        return expr
    return cmp


def _correlated_lookup(df: DataFrame, spec: dict[str, Any],
                       collections: dict[str, DataFrame]) -> DataFrame:
    """Correlated ``$lookup`` (``let`` + ``pipeline``, and the concise
    ``localField``/``foreignField`` + ``pipeline`` form), decompiled to
    distributed joins — never a per-document subquery loop. The leading
    ``$match`` ``$expr`` must contribute at least one
    ``{$eq: ["$$var", "$field"]}`` equality (it bounds the join); the
    pipeline's first stage must be a ``$match`` containing ``$expr``.

    FAST path (no let-var references beyond the equality prefix): the
    residual sub-pipeline runs ONCE over the filtered foreign
    collection grouped by its own join fields — valid because equality
    correlation makes the sub-result a pure function of the key. One
    shuffle per side.

    GENERAL path (non-equi correlated conjuncts, or ``$$var`` refs in
    later stages): the classic unnesting rewrite (cf. Neumann & Kemper,
    "Unnesting Arbitrary Queries", BTW'15 — the magic-set/distinct-
    correlated-values idea): materialize the DISTINCT outer let-value
    tuples, equi-join them to the foreign side on the equality pairs,
    substitute every ``$$var`` with its joined ``__lk`` column
    (:func:`_subst_let_refs` — non-equi correlation becomes an ordinary
    post-join filter), run the residual sub-pipeline per let-tuple, and
    left-join the packed per-tuple arrays back to the outer side. The
    sub-pipeline is evaluated once per DISTINCT let tuple, not per
    outer document.

    Shared lowering: a terminal ``{$group: {_id: null, ...}}`` (the
    per-document aggregate idiom) is rewritten to group by the key
    columns via the existing :func:`_group` compiler, each key's single
    result doc packed as a 1-element array (Mongo emits no doc for an
    empty group — the empty-array coalesce reproduces that); a terminal
    ``$group`` with a GROUPING ``_id`` (expression or composite doc,
    r14) groups ONCE over (key columns, ``_id`` expr) and packs one
    element per distinct sub-key, the array sorted by ``_id``
    (distinct within a key, so the order is total); a ``$sort``
    immediately BEFORE either terminal ``$group`` form (r15 — Mongo's
    'latest doc per key' idiom: ``$sort`` then ``$first/$last/$push``)
    is ABSORBED into the group's order-sensitive accumulators
    (``$first``→``$top``, ``$firstN``→``$topN``, comparator-ordered
    ``$push``/``$mergeObjects`` — see :func:`_group`), so the
    per-document sort never plans as a global one; a terminal
    ``$sort`` [+ ``$skip`` n] [+ ``$limit`` k] suffix (Mongo's 'latest
    matching doc' idiom and its pagination cousin) becomes a per-KEY
    ordered top-k-after-offset — ``array_sort`` with a multi-field
    asc/desc comparator + ``slice`` on the packed array,
    zero extra shuffles (:func:`_split_term_sort_limit`); otherwise
    matching docs pack per key (sorted — deterministic beats Mongo's
    unspecified order, the $lookup convention). The final outer join is
    null-safe (Mongo's $eq matches null to null). Contracts (raise,
    never silently diverge): the sub-pipeline must keep the join/let
    key columns in scope (don't project them away), and
    per-outer-document stages beyond those terminal forms
    ($sample/$bucketAuto/a $sort not adjacent to the terminal $group/
    mid-pipeline $skip/$limit/non-terminal $group) are refused rather
    than applied globally."""
    foreign = collections[spec["from"]]
    let = dict(spec.get("let", {}))
    pipeline = list(spec["pipeline"])
    out = spec["as"]
    if "localField" in spec or "foreignField" in spec:
        # concise correlated form = sugar for a let/$expr equality prefix
        let["__lf"] = "$" + spec["localField"]
        pipeline.insert(0, {"$match": {"$expr": {
            "$eq": ["$$__lf", "$" + spec["foreignField"]]}}})
    if not pipeline or set(pipeline[0]) != {"$match"} \
            or "$expr" not in pipeline[0]["$match"]:
        raise ValueError(
            "$lookup with let: the pipeline must START with a $match "
            "containing $expr so the correlation can decompile to a join")
    match_spec = pipeline[0]["$match"]
    pairs, plain_conjs, corr_conjs = _split_lookup_correlation(
        match_spec["$expr"], set(let))
    # Terminal $sort [+ $limit] is the per-document ordered-top-k
    # idiom ('latest matching doc') — split it off FIRST: it lowers to
    # array_sort + slice on each key's packed array (one comparator,
    # zero extra shuffles), never a global sort/limit.
    rest, term_sort, term_skip, term_limit = \
        _split_term_sort_limit(pipeline[1:])
    if rest and isinstance(rest[-1], dict) and set(rest[-1]) == {"$bucket"}:
        # terminal $bucket (r14): the bucket label is ROW-LOCAL, so the
        # stage rewrites to $addFields(label) + terminal grouping-_id
        # $group and rides the per-key pack — 'histogram of matches per
        # outer document' without a per-document re-run
        rest = rest[:-1] + _bucket_as_group_stages(rest[-1]["$bucket"])
    if rest and isinstance(rest[-1], dict) \
            and set(rest[-1]) == {"$count"}:
        # terminal $count (r14): 'how many matches' — sugar for the
        # _id:null aggregate; the packed element carries the _id:null
        # slot the terminal-$group pack always emits (rectangular
        # deviation: Mongo's $count doc has no _id field; reading it
        # yields null here)
        cname = rest[-1]["$count"]
        if not isinstance(cname, str) or not cname:
            raise ValueError("$count expects a non-empty field name")
        rest = rest[:-1] + [{"$group": {"_id": None,
                                        cname: {"$sum": 1}}}]
    term_elem_order = None
    if rest and isinstance(rest[-1], dict) \
            and set(rest[-1]) == {"$sortByCount"}:
        # terminal $sortByCount (r14): sugar for $group-by-expr +
        # count-descending order — rides the same per-key pack, with
        # the packed array ordered (count desc, _id asc), Mongo's
        # contract plus the translator's deterministic tiebreak
        rest = rest[:-1] + [{"$group": {"_id": rest[-1]["$sortByCount"],
                                        "count": {"$sum": 1}}}]
        term_elem_order = {"count": -1, "_id": 1}
    # Per-document scope guard: the residual sub-pipeline runs ONCE
    # over the (filtered/joined) foreign frame — never once per outer
    # document — so only stages whose per-key result is invariant to
    # the other keys' rows are sound. A MID-pipeline $limit would be
    # Mongo's per-document limit applied GLOBALLY here, silently
    # emptying most documents' arrays. Contract: raise, never
    # silently diverge.
    _ROW_LOCAL = {"$match", "$project", "$addFields", "$set", "$unset",
                  "$unwind", "$replaceRoot", "$replaceWith", "$redact",
                  "$lookup", "$graphLookup",
                  # per-PARTITION stages made per-document by extending
                  # their partition key with the join/let keys (r14,
                  # _augment_partitions) — exact, never global
                  "$setWindowFields", "$densify", "$fill"}
    def _is_term_group(st) -> bool:
        return (isinstance(st, dict) and set(st) == {"$group"}
                and "_id" in st["$group"])

    for i, st in enumerate(rest):
        ops = set(st) if isinstance(st, dict) else set()
        if ops and ops <= _ROW_LOCAL:
            continue
        if ops == {"$group"} and i == len(rest) - 1 and "_id" in st["$group"]:
            # terminal per-doc $group — regrouped per (outer key, _id):
            # _id null packs ONE aggregate doc per key; a grouping _id
            # (r14) packs one element per distinct sub-key
            continue
        if (ops == {"$sort"} and i == len(rest) - 2
                and _is_term_group(rest[-1])):
            # $sort immediately before the terminal $group (r15 —
            # Mongo's 'latest doc per key' idiom): ABSORBED into the
            # group's order-sensitive accumulators ($first→$top,
            # $firstN→$topN, ordered $push/$mergeObjects) by the
            # _group compiler — the per-document sort never becomes a
            # global one, and order-insensitive accumulators ignore it
            continue
        raise ValueError(
            f"$lookup with let: sub-pipeline stage {sorted(ops)} is "
            "scoped PER OUTER DOCUMENT in Mongo but would apply "
            "globally under the join decompilation ($sample, "
            "$bucketAuto, a non-terminal $group, or a mid-pipeline "
            "$sort/$skip/$limit). Supported per-document forms: a "
            "TERMINAL $sort [+ $skip] [+ $limit] suffix (per-key "
            "ordered top-k-after-offset); a terminal $group (_id: "
            "null aggregate or grouping _id), optionally preceded by "
            "a $sort its ordered accumulators honor ($first/$last/"
            "$firstN/$lastN/$push/$mergeObjects — r15); a terminal "
            "$bucket (explicit default) / $sortByCount / $count; and "
            "$setWindowFields/$fill/$densify anywhere (partition key "
            "extended by the join keys — exact). Otherwise rewrite "
            "over the joined array ($sortArray + $slice)")
    plain_match = {k: v for k, v in match_spec.items() if k != "$expr"}
    general = bool(corr_conjs) or _mentions_vars(rest, set(let))

    def expr_match(conjs):
        return {"$match": {"$expr": ({"$and": conjs} if len(conjs) > 1
                                     else conjs[0])}}

    def split_term_group(stages):
        """(residual stages, terminal $group spec or None, absorbed
        $sort spec or None). A ``$sort`` immediately before the
        terminal ``$group`` (r15) is stripped here and handed to the
        ``_group`` compiler as ``sort_spec`` — its order-sensitive
        accumulators compile against the key, so no global sort is
        ever planned."""
        if stages and set(stages[-1]) == {"$group"} \
                and "_id" in stages[-1]["$group"]:
            if term_sort is not None or term_skip is not None \
                    or term_limit is not None:
                raise ValueError(
                    "$lookup sub-pipeline combining a TERMINAL "
                    "$sort/$skip/$limit suffix with a $group is "
                    "unsupported — put the $sort immediately BEFORE "
                    "the $group (its ordered accumulators honor it), "
                    "or aggregate the sliced array with "
                    "$sortArray/$slice + array operators in the outer "
                    "pipeline instead")
            gsort = None
            if len(stages) >= 2 and isinstance(stages[-2], dict) \
                    and set(stages[-2]) == {"$sort"}:
                gsort = dict(stages[-2]["$sort"])
                return stages[:-2], stages[-1]["$group"], gsort
            return stages[:-1], stages[-1]["$group"], None
        return stages, None, None

    def packed_list(fields):
        if term_sort is not None:
            bad = [f for f in term_sort if f not in fields]
            if bad:
                raise ValueError(
                    f"$lookup sub-pipeline $sort field(s) {bad} not in "
                    "the packed documents — keep them in the $project")
        lst = F.collect_list(F.struct(*fields))
        arr = (F.array_sort(lst, _lookup_sort_cmp(term_sort))
               if term_sort is not None else F.sort_array(lst))
        if term_limit is not None or term_skip is not None:
            # Mongo's $skip n then $limit k = elements n+1 .. n+k of
            # the per-key sorted array; a start past the end slices
            # to [] (Mongo: empty result), matching F.slice
            start = (term_skip or 0) + 1
            length = (F.lit(term_limit) if term_limit is not None
                      else F.size(arr))
            arr = F.slice(arr, F.lit(start), length)
        return arr

    def pack(sub, key_cols, term_group, gsort=None):
        missing = [src for src in key_cols.values()
                   if src not in sub.columns]
        if missing:
            raise ValueError(
                f"$lookup with let: the sub-pipeline projected away the "
                f"join/let key column(s) {missing} — keep them in the "
                "$project and drop them in the outer pipeline instead")
        if term_group is not None:
            gspec = dict(term_group)
            uid = gspec.pop("_id")
            idspec: dict[str, Any] = {k: "$" + src
                                      for k, src in key_cols.items()}
            if uid is None:
                gspec["_id"] = idspec
                grouped = _group(sub, gspec, sort_spec=gsort)
                accs = [c for c in grouped.columns if c != "_id"]
                return grouped.select(
                    *[F.col(f"_id.{k}").alias(k) for k in key_cols],
                    F.array(F.struct(F.lit(None).alias("_id"),
                                     *[F.col(c) for c in accs]))
                    .alias(out))
            # grouping _id (r14): one array element per DISTINCT
            # sub-key per outer key — ONE aggregation over (join keys,
            # _id expr), then a per-key pack; never a per-document
            # re-run. Packed array sorted by _id (distinct within a
            # key, so the order is total) — the translator's
            # determinism convention for Mongo's unspecified $group
            # output order. __gid* names keep the user's _id fields
            # clear of the __lk join-key slots.
            composite = isinstance(uid, dict) and not (
                len(uid) == 1 and next(iter(uid)).startswith("$"))
            if composite:
                idspec.update({f"__gid_{f}": e for f, e in uid.items()})
            else:
                idspec["__gid"] = uid
            gspec["_id"] = idspec
            grouped = _group(sub, gspec, sort_spec=gsort)
            accs = [c for c in grouped.columns if c != "_id"]
            gid_col = (F.struct(*[F.col(f"_id.__gid_{f}").alias(f)
                                  for f in uid]) if composite
                       else F.col("_id.__gid"))
            elem = F.struct(gid_col.alias("_id"),
                            *[F.col(c) for c in accs])
            lst = F.collect_list(elem)
            arr = (F.array_sort(lst, _lookup_sort_cmp(term_elem_order))
                   if term_elem_order is not None else F.sort_array(lst))
            return (grouped
                    .groupBy(*[F.col(f"_id.{k}").alias(k)
                               for k in key_cols])
                    .agg(arr.alias(out)))
        payload = [c for c in sub.columns if c not in key_cols]
        return (sub
                .groupBy(*[F.col(src).alias(k)
                           for k, src in key_cols.items()])
                .agg(packed_list(payload or sub.columns).alias(out)))

    if not general:
        pre: list[dict[str, Any]] = []
        if plain_conjs:
            pre.append(expr_match(plain_conjs))
        if plain_match:
            pre.append({"$match": plain_match})
        rest, term_group, gsort = split_term_group(rest)
        sub = apply_pipeline(
            foreign,
            pre + _augment_partitions(rest, [ff for _, ff in pairs]),
            collections)
        # key columns ARE the foreign join fields on this path, so they
        # belong in the packed docs too (Mongo's matched docs carry
        # them) — pass disjoint alias->source names and keep payload
        # full via a sentinel-free select below
        lk = {f"__lk{i}": ff for i, (_, ff) in enumerate(pairs)}
        missing = [ff for ff in lk.values() if ff not in sub.columns]
        if missing:
            raise ValueError(
                f"$lookup with let: the sub-pipeline projected away the "
                f"foreign join field(s) {missing} — keep them in the "
                "$project and drop them in the outer pipeline instead")
        if term_group is not None:
            packed = pack(sub, lk, term_group, gsort)
        else:
            packed = (sub
                      .groupBy(*[F.col(ff).alias(k)
                                 for k, ff in lk.items()])
                      .agg(packed_list(sub.columns).alias(out)))
        join_vars = [var for var, _ in pairs]
    else:
        lets = list(let)
        lk_of = {v: f"__lk{i}" for i, v in enumerate(lets)}
        keys_df = (df.select(*[_expr(let[v]).alias(lk_of[v])
                               for v in lets]).distinct())
        jcond = None
        for var, ff in pairs:
            c = F.col(lk_of[var]).eqNullSafe(F.col(ff))
            jcond = c if jcond is None else jcond & c
        joined = keys_df.join(foreign, jcond, "inner")
        for st in rest:
            if isinstance(st, dict) and "$lookup" in st:
                shadowed = set(st["$lookup"].get("let", {})) & set(let)
                if shadowed:
                    # a nested $lookup's let re-binds our var names —
                    # blind substitution would corrupt its refs
                    raise ValueError(
                        f"nested $lookup let re-binds outer let "
                        f"variable(s) {sorted(shadowed)} — rename the "
                        "inner variables")
        sub_stages: list[dict[str, Any]] = []
        if corr_conjs:
            sub_stages.append(expr_match(
                _subst_let_refs(corr_conjs, lk_of)))
        if plain_conjs:
            sub_stages.append(expr_match(plain_conjs))
        if plain_match:
            sub_stages.append({"$match": plain_match})
        rest_sub, term_group, gsort = split_term_group(
            _subst_let_refs(rest, lk_of))
        rest_sub = _augment_partitions(rest_sub, list(lk_of.values()))
        sub = apply_pipeline(joined, sub_stages + rest_sub, collections)
        lk = {lk_of[v]: lk_of[v] for v in lets}
        packed = pack(sub, lk, term_group, gsort)
        join_vars = lets

    cond = None
    for k, var in zip(lk, join_vars):
        c = _expr(let[var]).eqNullSafe(F.col(k))
        cond = c if cond is None else cond & c
    empty = F.array().cast(packed.schema[out].dataType)
    return (df.drop(out).join(packed, cond, "left").drop(*lk)
            .withColumn(out, F.coalesce(F.col(out), empty)))


def _graph_lookup(df: DataFrame, spec: dict[str, Any],
                  collections: dict[str, DataFrame] | None) -> DataFrame:
    """``$graphLookup``: breadth-first traversal of ``from`` starting
    at ``startWith``, following connectFromField -> connectToField, the
    matched docs packed (unique by ``_id``, sorted) into ``as``. One
    distributed join per DEPTH LEVEL (driver rounds = graph depth, the
    standard Spark shape for bounded recursion — cf. operators/graph.py),
    lineage truncated per round with localCheckpoint; the accumulated
    (root, _id) set guards cycles, so the loop terminates on any graph.
    ``maxDepth``/``depthField`` as in Mongo (depth 0 = the startWith
    matches). Input docs and ``from`` docs need ``_id``."""
    if not collections or spec["from"] not in collections:
        raise ValueError(
            f"$graphLookup needs collections={{{spec.get('from')!r}: "
            "DataFrame}} passed to apply_pipeline")
    frm = collections[spec["from"]]
    cf, ct, out = (spec["connectFromField"], spec["connectToField"],
                   spec["as"])
    if "." in cf or "." in ct:
        raise ValueError("$graphLookup dotted connect fields unsupported")
    if "_id" not in df.columns or "_id" not in frm.columns:
        raise ValueError("$graphLookup needs _id on both sides")
    max_depth = spec.get("maxDepth")
    depth_field = spec.get("depthField")
    frontier = (df.select(F.col("_id").alias("__root"),
                          _expr(spec["startWith"]).alias("__key"))
                .filter(F.col("__key").isNotNull()).distinct())
    matched = None
    depth = 0
    while not frontier.isEmpty():
        if max_depth is not None and depth > max_depth:
            break
        hits = (frontier.join(frm, frontier["__key"] == frm[ct], "inner")
                .drop("__key")
                .withColumn("__depth", F.lit(depth).cast("long")))
        if matched is not None:
            hits = hits.join(matched.select("__root", "_id"),
                             ["__root", "_id"], "left_anti")
        hits = hits.localCheckpoint(eager=True)
        if hits.isEmpty():
            break
        matched = hits if matched is None else matched.unionByName(hits)
        frontier = (hits.select("__root", F.col(cf).alias("__key"))
                    .filter(F.col("__key").isNotNull()).distinct())
        depth += 1
    struct_cols = [F.col(c) for c in frm.columns]
    if depth_field:
        struct_cols.append(F.col("__depth").alias(depth_field))
    if matched is None:
        # no start key matched anything: every doc gets an empty array
        matched = (frm.withColumn("__depth", F.lit(0).cast("long"))
                   .withColumn("__root", F.lit(None).cast(
                       df.schema["_id"].dataType)).limit(0))
    packed = (matched.groupBy("__root")
              .agg(F.sort_array(F.collect_list(
                  F.struct(*struct_cols))).alias(out)))
    empty = F.array().cast(packed.schema[out].dataType)
    return (df.join(packed, df["_id"] == packed["__root"], "left")
            .drop("__root")
            .withColumn(out, F.coalesce(F.col(out), empty)))


def _facet(df: DataFrame, spec: dict[str, Any],
           collections: dict[str, DataFrame] | None) -> DataFrame:
    """``$facet``: N named sub-pipelines over ONE shared input, emitting
    a single document whose fields are arrays of each sub-pipeline's
    output docs. The input DataFrame is persisted so every facet reads
    the SAME materialization (one source scan + N InMemoryTableScans —
    the plan gate in tests), then each facet collapses to a one-row
    array aggregate and the single-row frames cross-join back into one
    document. Array order is pinned with sort_array (Mongo materializes
    sub-pipeline order; a distributed collect has none — deterministic
    beats unspecified, the $push/$lookup convention, so a facet ending
    in $sort is re-ordered by field value in the output array). Scale
    note: $facet output is ONE document (Mongo caps it at 16 MB) — the
    stage is for pre-aggregated dashboard shapes, and the persist cost
    is bounded by whatever $match/$project runs before it, exactly as
    in Mongo."""
    if not isinstance(spec, dict) or not spec:
        raise ValueError("$facet expects a non-empty {name: [stages]}")
    banned = {"$facet", "$merge", "$out"}
    for name, sub in spec.items():
        for st in sub:
            if set(st) & banned:
                raise ValueError(
                    f"$facet sub-pipeline {name!r} may not contain "
                    f"{sorted(set(st) & banned)} (Mongo's rule)")
    df = df.persist()
    acc = None
    for name, sub in spec.items():
        sub_df = apply_pipeline(df, sub, collections)
        one = sub_df.agg(F.sort_array(F.collect_list(F.struct(
            *[F.col(c) for c in sub_df.columns]))).alias(name))
        acc = one if acc is None else acc.crossJoin(one)
    # the facet output is ONE document by design, so materialize it
    # eagerly (cheap) and release the shared-scan cache — without this
    # every $facet pins its input in block storage for the session
    # lifetime
    acc = acc.localCheckpoint(eager=True)
    df.unpersist()
    return acc


def _target_spec(targets, name, op: str) -> dict:
    """Normalize a target binding. A bare string is a snapshot-table
    path (the default sink); a dict selects the kind:

    - ``{"kind": "snap", "path": p}`` — snapshot table (full matrix)
    - ``{"kind": "lake", "path": p, "partition_col": c}`` — hive-
      partitioned lake via ``lake_merge`` (partition-pruned rewrite)
    - ``{"kind": "jdbc", "url": u, "table": t[, "properties",
      "dialect"]}`` — live database via ``jdbc_merge`` (staging + ONE
      set-based MERGE/ON CONFLICT statement)
    """
    if not targets or name not in targets:
        raise ValueError(
            f"{op} into {name!r} needs targets={{{name!r}: <snap table "
            "path | target spec dict>}} passed to apply_pipeline")
    raw = targets[name]
    return {"kind": "snap", "path": raw} if isinstance(raw, str) \
        else dict(raw)


def _read_or_empty(spark, path: str, like: DataFrame) -> DataFrame:
    """Post-write read-back; an empty table (nothing ever committed, or
    an $out of zero rows) reads as the batch's empty frame."""
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.snapshots import (
        current_version,
        read_manifest,
        read_snapshot,
    )

    if current_version(spark, path) == 0 or \
            not read_manifest(spark, path)["files"]:
        return like.limit(0)
    return read_snapshot(spark, path)


def _merge_update_pipeline(tgt: DataFrame, matched: DataFrame,
                           keys: list[str], stages: list[dict[str, Any]],
                           batch_cols: list[str],
                           let: dict | None = None) -> DataFrame:
    """``$merge`` ``whenMatched`` UPDATE-PIPELINE subset
    (``[{$set: {...}}, ...]``): evaluate each ``$set``/``$addFields``
    stage over the MATCHED target rows, with bare ``$field`` refs
    resolving to the existing target document and ``$$new`` to the
    incoming batch document — Mongo's exact variable contract for this
    form. Lowered as ONE inner join (matched batch rows packed into a
    single ``__new`` struct, so column names never collide) + pure
    column expressions; the conflict-increment idiom
    ``{$set: {qty: {$add: ["$qty", "$$new.qty"]}}}`` stays inside
    whole-stage codegen. Subset contracts (raise, never guess): stages
    must be ``$set``/``$addFields``/``$unset`` ($unset nulls the
    column — the rectangular deviation from field removal); no dotted
    paths; assigned fields
    must already exist in the target schema (evolve with $out first)
    and must not be ``on`` keys; each stage's expressions see the
    PRE-stage state (Mongo stage semantics), sequential stages chain."""
    packed = matched.select(
        *keys, F.struct(*[F.col(c) for c in batch_cols]).alias("__new"))
    up = tgt.join(packed, keys, "inner")
    if let:
        # Mongo's $merge let: variables are expressions over the SOURCE
        # (batch) document, REPLACING the default {new: $$ROOT} — bare
        # $refs rebase onto the packed __new struct
        new_schema = packed.schema["__new"].dataType
        src_env = {"__mn": F.col("__new"), "ROOT": F.col("__new"),
                   "CURRENT": F.col("__new")}
        env = {name: _expr(_rebase_refs(e, new_schema, "__mn"), src_env)
               for name, e in let.items()}
    else:
        env = {"new": F.col("__new")}
    for st in stages:
        if not isinstance(st, dict) or len(st) != 1:
            raise ValueError(f"malformed whenMatched pipeline stage: {st!r}")
        (sop, sspec), = st.items()
        if sop == "$unset":
            # rectangular deviation, documented: Mongo removes the
            # field; a fixed schema keeps the column and nulls it
            sspec = {f: None for f in
                     (sspec if isinstance(sspec, list) else [sspec])}
        elif sop not in ("$set", "$addFields"):
            raise ValueError(
                f"whenMatched pipelines support $set/$addFields/$unset "
                f"only, got {sop!r} — compute richer updates in the "
                "main pipeline and use whenMatched: 'merge'")
        assigns = {}
        for fld, e in sspec.items():
            if "." in fld:
                raise ValueError(
                    f"whenMatched $set of nested path {fld!r} is "
                    "unsupported")
            if fld in keys:
                raise ValueError(
                    f"whenMatched $set may not modify 'on' field {fld!r}")
            if fld not in tgt.columns:
                raise ValueError(
                    f"whenMatched $set field {fld!r} absent from the "
                    "target schema — evolve the target first ($out)")
            assigns[fld] = _expr(e, env).cast(tgt.schema[fld].dataType)
        # one select per stage: every expression sees the pre-stage state
        up = up.select(*[
            (assigns[c].alias(c) if c in assigns else F.col(c))
            for c in up.columns])
    return up.select(*tgt.columns)


def _sql_literal(v: Any) -> str:
    """Render a Python literal as portable SQL (Postgres + Derby)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        # repr(inf)/repr(nan) are not SQL — the statement would fail
        # server-side AFTER staging is written, as an opaque database
        # error; reject at compile time instead (r13 ADVICE)
        if isinstance(v, float) and not math.isfinite(v):
            raise ValueError(
                f"unsupported SQL literal in whenMatched pipeline: "
                f"non-finite float {v!r}")
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise ValueError(f"unsupported SQL literal in whenMatched "
                     f"pipeline: {v!r}")


def _compile_merge_set_sql(stages: list[dict[str, Any]], keys: list[str],
                           cols: list[str], let: dict | None,
                           quote, tq: str, sq: str) -> dict[str, str]:
    """Compile a ``$merge`` ``whenMatched`` update pipeline into the SET
    expressions of ONE server-side set-based statement (Postgres
    ``INSERT .. ON CONFLICT DO UPDATE SET`` / ANSI ``MERGE .. WHEN
    MATCHED THEN UPDATE SET``) — the reference's actual sink is live
    Postgres (ref user_table.py:105-121), so the conflict-increment
    idiom must run SERVER-side in the same single statement as the
    upsert, never a read-modify-write round trip.

    ``tq``/``sq`` are the target/source row qualifiers of the chosen
    dialect (table name + ``EXCLUDED`` for Postgres, ``t``/``s`` for
    ANSI MERGE); ``quote`` is the dialect's identifier quoter. Bare
    ``$field`` refs read the EXISTING target row, ``$$new.field`` the
    incoming batch row, and custom ``let`` variables are expressions
    over the source document (replacing the default ``new`` binding —
    Mongo's contract). Sequential stages chain by textual substitution:
    stage k's refs to a field assigned in stage k-1 inline that stage's
    compiled expression, reproducing Mongo's stage-by-stage document
    states inside one statement (SQL UPDATE SET RHS all see the
    pre-update row, so the substitution is exactly the fixpoint).
    Supported expression subset (raise, never guess): literals, field
    refs, $add/$subtract/$multiply/$divide/$mod, $ifNull, $cond,
    $eq/$ne/$gt/$gte/$lt/$lte/$and/$or/$not, $concat, $abs/$floor/
    $ceil, $literal — richer updates belong in the main pipeline with
    whenMatched: 'merge', or on a snap target (full expression
    language)."""
    colset = set(cols)
    if let:
        letmap = {name: "(" + _sql_src_expr(e, colset, quote, sq) + ")"
                  for name, e in let.items()}
    else:
        letmap = None

    cur: dict[str, str] = {}

    def ref(f: str) -> str:
        if f in cur:
            return cur[f]
        if f not in colset:
            raise ValueError(
                f"whenMatched $set references {f!r} which is not a "
                "batch/target column (jdbc targets need a rectangular "
                "batch)")
        return f"{tq}.{quote(f)}"

    def comp(e: Any) -> str:
        return _sql_merge_expr(e, ref, letmap, colset, quote, sq)

    for st in stages:
        if not isinstance(st, dict) or len(st) != 1:
            raise ValueError(f"malformed whenMatched pipeline stage: {st!r}")
        (sop, sspec), = st.items()
        if sop == "$unset":
            # rectangular deviation, documented: Mongo removes the
            # field; SQL keeps the column and sets it NULL
            sspec = {f: None for f in
                     (sspec if isinstance(sspec, list) else [sspec])}
        elif sop not in ("$set", "$addFields"):
            raise ValueError(
                f"whenMatched pipelines support $set/$addFields/$unset "
                f"only, got {sop!r} — compute richer updates in the "
                "main pipeline and use whenMatched: 'merge'")
        assigns = {}
        for fld, e in sspec.items():
            if "." in fld:
                raise ValueError(
                    f"whenMatched $set of nested path {fld!r} is "
                    "unsupported")
            if fld in keys:
                raise ValueError(
                    f"whenMatched $set may not modify 'on' field {fld!r}")
            if fld not in colset:
                raise ValueError(
                    f"whenMatched $set field {fld!r} absent from the "
                    "batch/target columns")
            v = comp(e)
            # Derby accepts `SET c = NULL` but not `(NULL)` — keep a
            # bare NULL unwrapped
            assigns[fld] = v if v == "NULL" else "(" + v + ")"
        # stage barrier: every expression above saw the PRE-stage state
        cur.update(assigns)
    return cur


def _sql_src_expr(e: Any, colset: set, quote, sq: str) -> str:
    """Compile a $merge ``let`` expression — scoped to the SOURCE
    (batch) document, so bare ``$field`` refs read the staging row."""
    def ref(f: str) -> str:
        if f not in colset:
            raise ValueError(f"$merge let references unknown batch "
                             f"column {f!r}")
        return f"{sq}.{quote(f)}"
    return _sql_merge_expr(e, ref, None, colset, quote, sq,
                           allow_new=False)


def _sql_merge_expr(e: Any, ref, letmap, colset: set, quote, sq: str,
                    allow_new: bool = True) -> str:
    """Recursive Mongo-expression → SQL compiler for the whenMatched
    update-pipeline subset (see :func:`_compile_merge_set_sql`)."""
    def rec(x):
        return _sql_merge_expr(x, ref, letmap, colset, quote, sq,
                               allow_new)

    if isinstance(e, str) and e.startswith("$$"):
        body = e[2:]
        var, _, fld = body.partition(".")
        if letmap is not None:
            if var not in letmap:
                raise ValueError(f"unknown $merge let variable $${var}")
            if fld:
                raise ValueError(
                    f"$${var}.{fld}: let variables compile to scalar "
                    "SQL expressions — bind one variable per field")
            return letmap[var]
        if var != "new":
            raise ValueError(
                f"unknown variable $${var} in whenMatched pipeline "
                "(default binding is $$new; add 'let' for others)")
        if not allow_new or not fld or "." in fld:
            raise ValueError(
                "whenMatched pipelines on jdbc targets support "
                "$$new.<field> refs (one level)")
        if fld not in colset:
            raise ValueError(f"$$new.{fld} is not a batch column")
        return f"{sq}.{quote(fld)}"
    if isinstance(e, str) and e.startswith("$"):
        f = e[1:]
        if "." in f:
            raise ValueError(
                f"nested path {e!r} unsupported in a jdbc whenMatched "
                "pipeline")
        return ref(f)
    if isinstance(e, (str, int, float, bool)) or e is None:
        return _sql_literal(e)
    if not isinstance(e, dict) or len(e) != 1:
        raise ValueError(
            f"unsupported whenMatched expression for a jdbc target: "
            f"{e!r} — use a snap target for the full expression "
            "language")
    (op, arg), = e.items()
    if op == "$literal":
        return _sql_literal(arg)
    _VARIADIC = {"$add": " + ", "$multiply": " * ", "$and": " AND ",
                 "$or": " OR ", "$concat": " || "}
    if op in _VARIADIC:
        parts = [rec(a) for a in arg]
        if not parts:
            raise ValueError(f"{op} needs at least one operand")
        return "(" + _VARIADIC[op].join(parts) + ")"
    _BINARY = {"$subtract": "-", "$eq": "=",
               "$ne": "<>", "$gt": ">", "$gte": ">=", "$lt": "<",
               "$lte": "<="}
    if op in _BINARY:
        a, b = arg
        return f"({rec(a)} {_BINARY[op]} {rec(b)})"
    if op == "$divide":
        # Mongo $divide is float division; bare SQL `/` on two
        # integers is INTEGER division in Postgres/Derby — cast the
        # dividend so both lowerings (snap column exprs and this SQL
        # path) agree
        a, b = arg
        return f"(CAST({rec(a)} AS DOUBLE PRECISION) / {rec(b)})"
    if op == "$mod":
        a, b = arg
        return f"MOD({rec(a)}, {rec(b)})"
    if op == "$ifNull":
        if not isinstance(arg, list) or len(arg) < 2:
            raise ValueError("$ifNull needs [expr, ..., fallback]")
        return "COALESCE(" + ", ".join(rec(a) for a in arg) + ")"
    if op == "$cond":
        if isinstance(arg, dict):
            c, th, el = arg["if"], arg["then"], arg["else"]
        else:
            c, th, el = arg
        return (f"(CASE WHEN {rec(c)} THEN {rec(th)} "
                f"ELSE {rec(el)} END)")
    if op == "$not":
        a = arg[0] if isinstance(arg, list) else arg
        return f"(NOT {rec(a)})"
    _FUNC = {"$abs": "ABS", "$floor": "FLOOR", "$ceil": "CEILING"}
    if op in _FUNC:
        return f"{_FUNC[op]}({rec(arg)})"
    raise ValueError(
        f"whenMatched pipeline operator {op!r} has no jdbc SQL "
        "lowering — use a snap target for the full expression language")


def _write_stage(df: DataFrame, op: str, spec: Any, targets) -> DataFrame:
    """Terminal ``$out`` / ``$merge`` write stages — the reference's
    whole purpose is pipeline -> warehouse writes (ref
    dags/mongo_to_postgres_migration.py:109-155: read pipeline, then a
    per-table row-wise upsert); here they lower onto the snapshot
    table-format commits, so the write is ONE atomic commit with
    merge-on-read cost instead of a row loop.

    ``$out`` replaces the whole target (snap_overwrite). ``$merge``
    lowers the whenMatched x whenNotMatched matrix onto set operations
    + a single snap commit:

    - whenMatched  replace      -> batch row wins wholesale
    -              merge        -> batch columns overwrite, target-only
                                   columns carry over (field-wise merge
                                   on a rectangular schema)
    -              [pipeline]   -> $set/$addFields update pipeline over
                                   the matched target rows, $$new bound
                                   to the batch doc — snap/lake targets
                                   via _merge_update_pipeline (column
                                   expressions), jdbc targets compiled
                                   into the single server-side
                                   statement's SET clause
                                   (_compile_merge_set_sql)
    -              keepExisting -> matched batch rows dropped
    -              fail         -> error if any batch key matches
    - whenNotMatched insert / discard / fail analogously

    Everything that changes rows funnels into ONE snap_merge_keys /
    snap_append commit (O(batch) merge-on-read, never a table rewrite),
    so readers see the old or the new state atomically. Deviations,
    documented: the batch must have at most one row per ``on`` key (a
    distributed engine has no doc order to break ties; Mongo errors on
    multi-matches too), whenMatched update pipelines support the
    $set/$addFields/$unset subset (all three target kinds; jdbc takes
    the SQL-compilable expression subset), and batch columns
    absent from the target's schema
    raise (evolve the schema with $out/snap_overwrite first). Returns
    the target's post-write snapshot so pipelines remain composable
    for gating."""
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.snapshots import (
        current_version,
        read_snapshot,
        snap_append,
        snap_merge_keys,
        snap_overwrite,
    )

    spark = df.sparkSession
    if op == "$out":
        name = spec if isinstance(spec, str) else spec["coll"]
        t = _target_spec(targets, name, "$out")
        kind = t.get("kind", "snap")
        if kind == "snap":
            snap_overwrite(spark, t["path"], df, note="$out")
            return _read_or_empty(spark, t["path"], df)
        if kind == "lake":
            w = df.write.mode("overwrite")
            if t.get("partition_col"):
                w = w.partitionBy(t["partition_col"])
            w.parquet(t["path"])
            return spark.read.parquet(t["path"])
        if kind == "jdbc":
            props = t.get("properties") or {}
            df.write.mode("overwrite").jdbc(t["url"], t["table"],
                                            properties=props)
            return spark.read.jdbc(t["url"], t["table"],
                                   properties=props)
        raise ValueError(f"unknown $out target kind: {kind!r}")

    if isinstance(spec, str):
        spec = {"into": spec}
    name = spec["into"]
    if isinstance(name, dict):
        name = name["coll"]
    on = spec.get("on", "_id")
    keys = [on] if isinstance(on, str) else list(on)
    wm = spec.get("whenMatched", "merge")
    wnm = spec.get("whenNotMatched", "insert")
    wm_pipe = None
    if isinstance(wm, list):
        # update-pipeline form — validated and lowered per matched key
        # by _merge_update_pipeline (snap targets only)
        wm_pipe, wm = wm, "pipeline"
    if wm not in ("replace", "keepExisting", "merge", "fail", "pipeline"):
        raise ValueError(f"unsupported whenMatched: {wm!r}")
    if wnm not in ("insert", "discard", "fail"):
        raise ValueError(f"unsupported whenNotMatched: {wnm!r}")
    t = _target_spec(targets, name, "$merge")
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"$merge 'on' fields {missing} missing from "
                         "the pipeline output")
    # at most one batch row per key, every mode: the merge commit's
    # delete cannot distinguish duplicates, and Mongo's own sequential
    # semantics depend on doc order a distributed batch doesn't have
    dup = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
           .filter("__n > 1").limit(1).collect())
    if dup:
        raise ValueError(
            f"$merge: batch has multiple rows for key "
            f"{ {k: dup[0][k] for k in keys} } — dedupe upstream")

    kind = t.get("kind", "snap")
    if kind != "snap":
        # lake/jdbc sinks implement exactly the UPSERT (the reference's
        # flagship write, ref user_table.py:105-121 made set-based):
        # matched rows update, misses insert — Mongo's default
        # merge+insert (== replace+insert on a rectangular full-column
        # batch). The full matrix needs the snapshot sink.
        if wm not in ("merge", "replace", "pipeline") or wnm != "insert":
            raise ValueError(
                f"$merge into a {kind!r} target supports whenMatched "
                "merge/replace + whenNotMatched insert (the sink's "
                "upsert); use a snap target for the full matrix")
        mutable = [c for c in df.columns if c not in keys]
        if kind == "lake":
            from airflow_pipelines_from_mongo_to_postgres_spark.sources.sinks import (
                lake_merge,
            )
            from airflow_pipelines_from_mongo_to_postgres_spark.sources.snapshots import (
                _jvm_fs,
            )

            fs, jvm = _jvm_fs(spark, t["path"])
            hpath = jvm.org.apache.hadoop.fs.Path(t["path"])
            # existence probe must mean "has data", not "dir exists" —
            # an empty dir (failed prior write) would make the target
            # read below die with a raw schema-inference
            # AnalysisException instead of bootstrapping
            if not fs.exists(hpath) or not fs.listStatus(hpath):
                # bootstrap: Mongo creates the target collection. This
                # covers whenMatched update pipelines too — with no
                # existing target every batch row is whenNotMatched,
                # so insert-all IS Mongo's result (the pipeline never
                # runs against an empty matched set).
                (df.write.mode("overwrite")
                 .partitionBy(t["partition_col"]).parquet(t["path"]))
            else:
                batch = df
                if wm == "pipeline":
                    # read-modify-write: evaluate the $set pipeline over
                    # the MATCHED target rows (partition pruning happens
                    # inside lake_merge's touched-partition isin scan;
                    # here the target read is key-bounded by the semi
                    # join), then upsert the computed rows — matched
                    # rows carry pipeline results, misses insert as-is
                    tgt = spark.read.parquet(t["path"])
                    if set(df.columns) != set(tgt.columns):
                        raise ValueError(
                            "$merge whenMatched pipeline into a lake "
                            "target needs a rectangular batch (same "
                            "columns as the target)")
                    tkeys = tgt.select(*keys).dropDuplicates(keys)
                    up = _merge_update_pipeline(
                        tgt, df.join(tkeys, keys, "left_semi"),
                        keys, wm_pipe, df.columns, spec.get("let"))
                    batch = up.unionByName(
                        df.join(tkeys, keys, "left_anti")
                        .select(*up.columns))
                lake_merge(spark, t["path"], batch, keys,
                           t["partition_col"],
                           [c for c in batch.columns if c not in keys])
            return spark.read.parquet(t["path"])
        if kind == "jdbc":
            from airflow_pipelines_from_mongo_to_postgres_spark.sources.sinks import (
                jdbc_merge,
            )

            props = t.get("properties") or {}
            dialect = t.get("dialect", "postgres")
            set_sql = None
            if wm == "pipeline":
                # compile the $set pipeline into the SET clause of the
                # single server-side statement — the update runs in the
                # SAME transaction as the insert, no read-modify-write
                if dialect == "postgres":
                    quote, tq, sq = (lambda c: c), t["table"], "EXCLUDED"
                else:
                    quote, tq, sq = (lambda c: f'"{c}"'), "t", "s"
                set_sql = _compile_merge_set_sql(
                    wm_pipe, keys, list(df.columns), spec.get("let"),
                    quote, tq, sq)
            jdbc_merge(df, t["url"], t["table"], keys, mutable,
                       properties=props, dialect=dialect,
                       set_sql=set_sql)
            return spark.read.jdbc(t["url"], t["table"],
                                   properties=props)
        raise ValueError(f"unknown $merge target kind: {kind!r}")

    path = t["path"]
    if current_version(spark, path) == 0:
        # empty target: every row is not-matched
        if wnm == "insert":
            snap_append(spark, path, df, note="$merge bootstrap")
        elif wnm == "fail" and df.limit(1).count():
            raise ValueError(
                "$merge whenNotMatched='fail': target is empty")
        return _read_or_empty(spark, path, df)

    tgt = read_snapshot(spark, path)
    extra = [c for c in df.columns if c not in tgt.columns]
    if extra:
        raise ValueError(
            f"$merge: batch columns {extra} absent from target "
            f"{name!r} — evolve the target schema first ($out)")
    tkeys = tgt.select(*keys).dropDuplicates(keys)
    matched = df.join(tkeys, keys, "left_semi")
    unmatched = df.join(tkeys, keys, "left_anti")
    if wm == "fail" and matched.limit(1).count():
        raise ValueError("$merge whenMatched='fail': batch keys match "
                         "existing target rows")
    if wnm == "fail" and unmatched.limit(1).count():
        raise ValueError("$merge whenNotMatched='fail': batch has keys "
                         "absent from the target")
    carry = [c for c in tgt.columns if c not in df.columns]
    parts = []
    if wm == "pipeline":
        parts.append(_merge_update_pipeline(tgt, matched, keys, wm_pipe,
                                            df.columns, spec.get("let")))
    if wm in ("replace", "merge"):
        up = matched
        if carry:
            if wm == "merge":
                # field-wise merge: batch columns overwrite, target-only
                # columns ride along from the matched target row
                up = up.join(tgt.select(*keys, *carry), keys, "left")
            else:
                for c in carry:
                    up = up.withColumn(
                        c, F.lit(None).cast(tgt.schema[c].dataType))
        parts.append(up)
    if wnm == "insert":
        ins = unmatched
        for c in carry:
            ins = ins.withColumn(c,
                                 F.lit(None).cast(tgt.schema[c].dataType))
        parts.append(ins)
    if parts:
        batch = parts[0]
        for p in parts[1:]:
            batch = batch.unionByName(p)
        batch = batch.select(*tgt.columns)
        if wm in ("replace", "merge", "pipeline"):
            # uniqueness already enforced above — skip the second check
            snap_merge_keys(spark, path, batch, keys, note=f"$merge {wm}",
                            on_duplicate="keep_all")
        else:
            # keepExisting: only never-seen keys land — append-only
            snap_append(spark, path, batch, note="$merge insert-only")
    return _read_or_empty(spark, path, df)


#: MongoDB's spherical-geometry Earth radius — the docs' "approximate
#: equatorial radius of 6,378.1 kilometers" used to convert between
#: radians and meters for 2dsphere distances.
_EARTH_RADIUS_M = 6378100.0


def _geo_near_point(near: Any) -> tuple[float, float, bool]:
    """``$geoNear.near`` spec → (lon, lat, is_geojson). GeoJSON Point
    (``{type: 'Point', coordinates: [lon, lat]}``) selects spherical
    meters; a legacy coordinate pair (``[lon, lat]`` array or two-field
    document, field order = lon, lat) selects legacy semantics (radians
    when ``spherical: true``, flat units otherwise) — Mongo's own rule."""
    if isinstance(near, dict) and near.get("type") == "Point":
        coords = near.get("coordinates")
        if not isinstance(coords, (list, tuple)) or len(coords) != 2:
            raise ValueError(
                "$geoNear: GeoJSON near needs coordinates: [lon, lat]")
        return float(coords[0]), float(coords[1]), True
    if isinstance(near, (list, tuple)) and len(near) == 2:
        return float(near[0]), float(near[1]), False
    if isinstance(near, dict) and len(near) == 2 and "type" not in near:
        lon, lat = near.values()  # legacy embedded doc: field order
        return float(lon), float(lat), False
    raise ValueError(
        "$geoNear: near must be a GeoJSON Point "
        "({type: 'Point', coordinates: [lon, lat]}) or a legacy "
        "[lon, lat] coordinate pair")


def _geo_key_lonlat(df: DataFrame, key: str) -> tuple[Column, Column]:
    """Resolve the document location field ``key`` (dotted paths OK) to
    (lon, lat) Columns. Accepts a GeoJSON Point struct (has
    ``coordinates``), a legacy ``[lon, lat]`` array, or a two-field
    legacy point document (field order = lon, lat)."""
    from pyspark.sql import types as ST

    dt: Any = df.schema
    for part in key.split("."):
        if not isinstance(dt, ST.StructType) or part not in dt.fieldNames():
            raise ValueError(
                f"$geoNear: key {key!r} not found in the document schema")
        dt = dt[part].dataType
    col = F.col(key)
    if isinstance(dt, ST.StructType) and "coordinates" in dt.fieldNames():
        return col["coordinates"][0], col["coordinates"][1]
    if isinstance(dt, ST.ArrayType):
        return col[0], col[1]
    if isinstance(dt, ST.StructType) and len(dt.fields) == 2:
        f0, f1 = dt.fieldNames()
        return col[f0], col[f1]
    raise ValueError(
        f"$geoNear: key {key!r} must be a GeoJSON Point struct (with "
        "'coordinates'), a legacy [lon, lat] array, or a two-field "
        f"legacy point document — got {dt.simpleString()}")


def _geo_near(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    """``$geoNear`` lowered to expression math — no geospatial index
    needed. Distance mode follows Mongo: a GeoJSON ``near`` computes the
    spherical (haversine) distance in METERS (radius 6378.1 km, the
    documented constant); a legacy ``near`` computes radians when
    ``spherical: true`` and flat Euclidean coordinate units otherwise.
    ``minDistance``/``maxDistance`` filter on the RAW distance (Mongo's
    unit rule), ``distanceMultiplier`` scales only the output field, and
    ``query`` is an ordinary ``$match`` document. Documents whose
    location is null/missing are excluded, as an index-backed $geoNear
    would. The result is globally sorted nearest-first — with a
    following ``$limit`` Spark plans TakeOrdered (per-partition top-k +
    one k-row merge), so the usual $geoNear+$limit idiom never performs
    a full sort at scale. ``key`` is REQUIRED (there is no index to
    infer the location field from).

    Per-row trig stays inside whole-stage codegen; the haversine operand
    is clamped to [0, 1] before ``asin`` so antipodal floating-point
    noise can't produce NaN."""
    allowed = {"near", "distanceField", "key", "spherical", "maxDistance",
               "minDistance", "query", "distanceMultiplier", "includeLocs"}
    unknown = set(spec) - allowed
    if unknown:
        raise ValueError(
            f"$geoNear: unsupported options {sorted(unknown)} "
            f"(supported: {sorted(allowed)})")
    if "near" not in spec or "distanceField" not in spec:
        raise ValueError("$geoNear requires 'near' and 'distanceField'")
    out_field = spec["distanceField"]
    if not isinstance(out_field, str) or "." in out_field:
        raise ValueError(
            "$geoNear: distanceField must be a top-level field name "
            "(dotted paths are unsupported — $addFields the struct after)")
    key = spec.get("key")
    if not key:
        raise ValueError(
            "$geoNear: 'key' is required — there is no geospatial index "
            "to infer the location field from; name the document field "
            "holding [lon, lat] or a GeoJSON Point")
    nlon, nlat, geojson = _geo_near_point(spec["near"])
    dlon, dlat = _geo_key_lonlat(df, key)
    spherical = bool(spec.get("spherical", False)) or geojson
    if spherical:
        lat1, lon1 = F.radians(F.lit(nlat)), F.radians(F.lit(nlon))
        lat2 = F.radians(dlat.cast("double"))
        lon2 = F.radians(dlon.cast("double"))
        hav = (F.pow(F.sin((lat2 - lat1) / F.lit(2.0)), F.lit(2.0))
               + F.cos(lat1) * F.cos(lat2)
               * F.pow(F.sin((lon2 - lon1) / F.lit(2.0)), F.lit(2.0)))
        # clamp fp noise past 1.0 before asin — but NOT via F.least,
        # which skips NULLs and would turn a missing location into a
        # phantom antipodal distance instead of propagating null
        root = F.sqrt(hav)
        dist = F.lit(2.0) * F.asin(
            F.when(root > F.lit(1.0), F.lit(1.0)).otherwise(root))
        if geojson:
            dist = dist * F.lit(_EARTH_RADIUS_M)
    else:
        dist = F.sqrt(
            F.pow(dlon.cast("double") - F.lit(nlon), F.lit(2.0))
            + F.pow(dlat.cast("double") - F.lit(nlat), F.lit(2.0)))
    tmp = "__geo_dist"
    df = df.withColumn(tmp, dist.cast("double")).filter(
        F.col(tmp).isNotNull())
    if "query" in spec:
        df = df.filter(_match_cond(spec["query"], df.schema))
    if "maxDistance" in spec:
        df = df.filter(F.col(tmp) <= F.lit(float(spec["maxDistance"])))
    if "minDistance" in spec:
        df = df.filter(F.col(tmp) >= F.lit(float(spec["minDistance"])))
    if "includeLocs" in spec:
        inc = spec["includeLocs"]
        if not isinstance(inc, str) or "." in inc:
            raise ValueError(
                "$geoNear: includeLocs must be a top-level field name")
        df = df.withColumn(inc, F.col(key))
    out = F.col(tmp)
    if "distanceMultiplier" in spec:
        out = out * F.lit(float(spec["distanceMultiplier"]))
    return (df.withColumn(out_field, out.cast("double")).drop(tmp)
            .orderBy(F.col(out_field).asc()))


def apply_pipeline(df: DataFrame, stages: list[dict[str, Any]],
                   collections: dict[str, DataFrame] | None = None,
                   targets: dict[str, str] | None = None
                   ) -> DataFrame:
    """Run a MongoDB aggregation pipeline against a DataFrame.

    ``collections`` resolves ``$lookup``/``$unionWith`` ``from`` names
    to DataFrames (equality localField/foreignField form, uncorrelated
    pipelines, and the correlated let+pipeline / concise forms via the
    equality-decompilation subset — see ``_correlated_lookup``).
    ``targets`` resolves terminal ``$merge``/``$out``
    collection names to snapshot-table paths (sources/snapshots.py) —
    the write actually COMMITS (the one eager point in the translator),
    and the call returns the target's post-write snapshot."""
    for i, stage in enumerate(stages):
        (op, spec), = stage.items()
        if op in ("$merge", "$out"):
            if i != len(stages) - 1:
                raise ValueError(f"{op} must be the final pipeline stage")
            return _write_stage(df, op, spec, targets)
        if op == "$geoNear":
            if i != 0:
                raise ValueError(
                    "$geoNear must be the first pipeline stage (Mongo's "
                    "own rule)")
            df = _geo_near(df, spec)
        elif op == "$match":
            df = df.filter(_match_cond(spec, df.schema))
        elif op == "$project":
            df = _project(df, spec)
        elif op == "$unwind":
            if isinstance(spec, str):
                path, preserve, idx = spec[1:], False, None
            else:
                path = spec["path"][1:]
                preserve = bool(spec.get("preserveNullAndEmptyArrays", False))
                idx = spec.get("includeArrayIndex")
            fn = F.explode_outer if preserve else F.explode
            if "." in path:
                if idx:
                    raise ValueError(
                        "$unwind includeArrayIndex with a nested path "
                        "is unsupported — $unwind the top-level array")
                # Mongo replaces the nested field IN PLACE. explode is a
                # generator (must sit in a top-level projection), so
                # explode into a temp column first, then graft the element
                # back into the struct with withField and drop the temp.
                top, rest = path.split(".", 1)
                tmp = "__unwound"
                df = (df.withColumn(tmp, fn(F.col(path)))
                      .withColumn(top,
                                  F.col(top).withField(rest, F.col(tmp)))
                      .drop(tmp))
            elif idx:
                # includeArrayIndex: posexplode emits (pos, value);
                # Mongo's index is a LONG, null on preserved null/empty
                # rows — posexplode_outer's null pos matches exactly
                pfn = F.posexplode_outer if preserve else F.posexplode
                others = [c for c in df.columns if c != path]
                df = df.select(*others,
                               pfn(F.col(path)).alias(idx, path))
                df = df.select(*others, path,
                               F.col(idx).cast("long").alias(idx))
            else:
                df = df.withColumn(path, fn(F.col(path)))
        elif op in ("$addFields", "$set"):
            # Mongo evaluates EVERY expression of one stage against the
            # stage-INPUT document — a later field's $$ROOT (or bare
            # ref) must not see earlier assignments in the same stage —
            # so compute the env once, build all value columns against
            # the input frame, and apply them in a single select.
            env0 = _root_env(df)
            assigns: dict[str, Column] = {}  # top-level name -> value
            nested: list[tuple[str, str, Column]] = []
            for name, v in spec.items():
                if "." in name:
                    # Mongo sets the NESTED field in place. withColumn
                    # would mint a top-level column literally named
                    # "a.b" — silent divergence — so graft via
                    # withField when the parent struct exists and fail
                    # loudly otherwise (Mongo would create intermediate
                    # documents; a rectangular engine needs the parent
                    # declared). Deviation: a NULL parent document stays
                    # NULL (withField semantics) where Mongo creates it.
                    top, restpath = name.split(".", 1)
                    from pyspark.sql import types as ST
                    if top not in df.columns or not isinstance(
                            df.schema[top].dataType, ST.StructType):
                        raise ValueError(
                            f"$addFields nested path {name!r} needs an "
                            f"existing struct column {top!r}")
                    nested.append((top, restpath, _expr(v, env0)))
                else:
                    assigns[name] = _expr(v, env0)
            cols = []
            for c in df.columns:
                colv = assigns.pop(c, F.col(c))
                for top, restpath, val in nested:
                    if top == c:
                        colv = colv.withField(restpath, val)
                cols.append(colv.alias(c))
            cols.extend(v.alias(n) for n, v in assigns.items())
            df = df.select(*cols)
        elif op == "$group":
            df = _group(df, spec)
        elif op == "$sort":
            df = df.orderBy(*[F.col(k).asc() if d == 1 else F.col(k).desc()
                              for k, d in spec.items()])
        elif op == "$limit":
            df = df.limit(int(spec))
        elif op == "$skip":
            df = df.offset(int(spec))
        elif op == "$documents":
            # collectionless literal source (Mongo: first stage of a
            # db.aggregate([...]) without a collection) — replaces the
            # incoming frame with inline rows; expression values are
            # not supported (literals only, the common test-data shape)
            if i != 0:
                raise ValueError("$documents must be the first stage")
            if not isinstance(spec, list) or not spec or \
                    not all(isinstance(d, dict) for d in spec):
                raise ValueError(
                    "$documents expects a non-empty array of documents")
            df = df.sparkSession.createDataFrame(spec)
        elif op == "$redact":
            df = _redact(df, spec)
        elif op == "$sample":
            # pseudo-random size docs (Mongo's reservoir sample):
            # rand-keyed orderBy+limit compiles to TakeOrdered — each
            # partition keeps its local top-k by the random key, ONE
            # merge of k-row heads, never a full shuffle/sort. Result
            # set is random per run, like Mongo's.
            df = df.orderBy(F.rand()).limit(int(spec["size"]))
        elif op == "$count":
            df = df.agg(F.count(F.lit(1)).alias(str(spec)))
        elif op == "$sortByCount":
            # sugar for $group{_id, count:$sum 1} + $sort{count:-1};
            # Mongo leaves count-ties unordered — pinned by _id (the
            # $lookup/$push determinism convention)
            df = (df.groupBy(_expr(spec).alias("_id"))
                  .agg(F.count(F.lit(1)).alias("count"))
                  .orderBy(F.col("count").desc(), F.col("_id")))
        elif op in ("$replaceRoot", "$replaceWith"):
            root = spec["newRoot"] if op == "$replaceRoot" else spec
            df = (df.select(_expr(root, _root_env(df)).alias("__root"))
                  .select("__root.*"))
        elif op == "$unionWith":
            if isinstance(spec, str):
                cname, sub = spec, []
            else:
                cname, sub = spec["coll"], spec.get("pipeline", [])
            if not collections or cname not in collections:
                raise ValueError(
                    f"$unionWith needs collections={{{cname!r}: "
                    "DataFrame}} passed to apply_pipeline")
            other = apply_pipeline(collections[cname], sub, collections)
            # Mongo unions heterogeneous documents; absent fields are
            # missing -> NULL on the rectangular side
            df = df.unionByName(other, allowMissingColumns=True)
        elif op == "$bucket":
            df = _bucket(df, spec)
        elif op == "$bucketAuto":
            df = _bucket_auto(df, spec)
        elif op == "$facet":
            df = _facet(df, spec, collections)
        elif op == "$unset":
            names = [spec] if isinstance(spec, str) else list(spec)
            dotted = [k for k in names if "." in k]
            if dotted:
                # DataFrame.drop ignores nested fields — a dotted unset
                # would silently SURVIVE where Mongo removes it
                raise ValueError(
                    f"$unset of nested paths is unsupported: {dotted}")
            df = df.drop(*[c for c in names if c in df.columns])
        elif op == "$fill":
            df = _fill(df, spec)
        elif op == "$densify":
            df = _densify(df, spec)
        elif op == "$graphLookup":
            df = _graph_lookup(df, spec, collections)
        elif op == "$setWindowFields":
            df = _set_window_fields(df, spec)
        elif op == "$lookup":
            if not collections or spec["from"] not in collections:
                raise ValueError(
                    f"$lookup needs collections={{{spec.get('from')!r}: "
                    "DataFrame}} passed to apply_pipeline")
            if "let" in spec or ("pipeline" in spec
                                 and "localField" in spec):
                df = _correlated_lookup(df, spec, collections)
                continue
            if "pipeline" in spec:
                # UNCORRELATED subquery attach (Mongo: no let, pipeline
                # references no outer fields): run the sub-pipeline
                # once, pack its rows into ONE sorted array row, and
                # broadcast-attach it to every document — the Spark
                # analogue of Mongo caching the uncorrelated result.
                # Size caveat as in Mongo: the array lands in every
                # output doc, so the sub-pipeline should aggregate.
                sub = apply_pipeline(collections[spec["from"]],
                                     spec["pipeline"], collections)
                packed = sub.agg(F.sort_array(F.collect_list(
                    F.struct(*[F.col(c) for c in sub.columns])))
                    .alias(spec["as"]))
                df = df.crossJoin(F.broadcast(packed))
                continue
            foreign = collections[spec["from"]]
            local, ff, out = (spec["localField"], spec["foreignField"],
                              spec["as"])
            # Pack the foreign side to ONE array row per key FIRST, then
            # a single left equi join — the local side never fans out
            # and regroups (Mongo's per-doc subarray semantics with one
            # shuffle on each side; a small foreign side broadcasts).
            # sort_array pins the array order (Mongo leaves it
            # unspecified; deterministic beats unspecified for gating).
            packed = (foreign
                      .groupBy(F.col(ff).alias("__lk"))
                      .agg(F.sort_array(F.collect_list(
                          F.struct(*foreign.columns))).alias(out)))
            empty = F.array().cast(packed.schema[out].dataType)
            df = (df.join(packed, F.col(local) == F.col("__lk"), "left")
                  .drop("__lk")
                  .withColumn(out, F.coalesce(F.col(out), empty)))
        else:
            if op in UNSUPPORTED_STAGES:
                raise UnsupportedMongoStage(
                    f"{op} is unsupported by design: "
                    f"{UNSUPPORTED_STAGES[op]} (full table: "
                    "sources/mongoql.py::UNSUPPORTED_STAGES, "
                    "README 'Unsupported Mongo stages')")
            raise ValueError(f"unsupported pipeline stage: {op}")
    return df
