"""Schema module: Avro-schema-JSON ↔ Spark StructType mapping, recursion
elimination, and compatibility checks.

Reference mapping (all relative to /root/reference/):
- JsonElementConversionFactory type matrix (gobblin-core/.../converter/
  avro/JsonElementConversionFactory.java:66-118): the
  JsonIntermediate→Avro type table (int/long/float/double/boolean/
  string/bytes/enum/record/array/map/union + date/time/timestamp
  logical types) re-expressed as Avro-JSON → Catalyst DataType.
- AvroRecursionEliminatingConverter (gobblin-core/.../converter/avro/
  AvroRecursionEliminatingConverter.java:42): drops fields that re-enter
  a record type already on the traversal path — Catalyst cannot
  represent recursive schemas at all, so elimination happens at schema
  build time.
- AvroSchemaCheckStrategy / schema compatibility
  (gobblin-core/.../policies/schema/SchemaCompatibilityPolicy.java,
  gobblin-utility/.../AvroUtils.java): reader/writer compatibility with
  the standard numeric promotions (int→long→float→double) and
  nullable-union widening.

Design: pure driver-side metadata functions — no Spark action anywhere.
The serde pair (operators/converters.avro_serde) consumes these to
derive the Avro writer schema for ``to_avro`` and the Catalyst schema
for ``from_avro``.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}

_LOGICAL: dict[tuple[str, str], T.DataType] = {
    ("int", "date"): T.DateType(),
    ("int", "time-millis"): T.IntegerType(),
    ("long", "time-micros"): T.LongType(),
    ("long", "timestamp-millis"): T.TimestampType(),
    ("long", "timestamp-micros"): T.TimestampType(),
    ("long", "local-timestamp-millis"): T.TimestampNTZType(),
    ("long", "local-timestamp-micros"): T.TimestampNTZType(),
}


def avro_to_struct(schema) -> T.DataType:
    """Avro schema (JSON string or parsed dict/list/str) → Catalyst
    DataType. Nullable unions become nullable fields; non-null unions of
    N branches become a struct of N optional ``member_<type>`` fields
    (Catalyst has no native union — this is the standard encoding, the
    same one spark-avro uses). Non-recursive NAMED-TYPE references
    (define record/enum/fixed once, reference it by name later — the
    Avro spec's definition-before-use rule makes one left-to-right walk
    sufficient) resolve to an inlined copy; RECURSIVE references still
    raise (run :func:`eliminate_recursion` first)."""
    if isinstance(schema, str):
        try:
            schema = json.loads(schema)
        except json.JSONDecodeError:
            pass  # bare primitive name like "string"
    return _convert(schema, path=(), defs={}, ns="", memo={})


def _register_named(node, ns: str, defs: dict) -> tuple[str, str, str]:
    """Register a named type under its Avro FULLNAME ONLY (spec
    "Names": a dotted name IS a fullname; an explicit ``namespace``
    attribute wins; otherwise the enclosing namespace is inherited —
    r12 review: avro-tools/Confluent schemas reference by fullname).
    r13 (ADVICE): the bare name is NOT a registration key when the type
    lives in a namespace — a bare reference resolves against the
    referencing site's namespace only, so registering ``A.Foo`` under
    bare ``Foo`` let a reference from namespace B (or the null
    namespace) silently bind across namespaces, first-registered-wins.
    When the namespace is null the fullname IS the bare name, which is
    exactly the one case the spec lets a bare reference reach it.
    Returns (bare, full, namespace-for-children)."""
    nm = node["name"]
    if "." in nm:
        full, (ns_here, bare) = nm, nm.rsplit(".", 1)
    else:
        ns_here = node.get("namespace", ns)
        bare, full = nm, (f"{ns_here}.{nm}" if ns_here else nm)
    # definition-site namespace rides along so a later reference
    # re-converts the definition under ITS OWN inherited namespace
    prev = defs.setdefault(full, (node, ns))
    if prev[0] is not node and prev[0] != node:
        # Avro forbids two DIFFERENT definitions of one fullname; the
        # old setdefault silently kept the first
        raise ValueError(f"duplicate definition of named type {full}")
    return bare, full, ns_here


def _convert(node, path: tuple, defs: dict, ns: str,
             memo: dict) -> T.DataType:
    if isinstance(node, str):
        if node in _PRIMITIVES:
            return _PRIMITIVES[node]
        # Spec name resolution (r13, ADVICE): a dotted reference IS a
        # fullname; an undotted one resolves in the referencing site's
        # namespace ONLY (which is the bare name itself when that
        # namespace is null). No cross-namespace fallback — 'Foo' from
        # namespace B never reaches A.Foo or a null-namespace Foo.
        cand = f"{ns}.{node}" if (ns and "." not in node) else node
        if cand in path:  # recursive named-type reference
            raise RecursionError(f"recursive reference to {node}")
        if cand in defs:
            # non-recursive reuse of a named type already defined
            # on this walk (audit r12 — real-world Avro reuses
            # named records constantly; only RE-ENTRY is
            # unrepresentable). Memoized: chained reuse would
            # otherwise re-expand exponentially (r12 review #4).
            if cand not in memo:
                d_node, d_ns = defs[cand]
                memo[cand] = _convert(d_node, path, defs, d_ns, memo)
            return memo[cand]
        raise ValueError(
            f"unresolved named type: {node}"
            + (f" (resolved as {cand} in namespace {ns!r})"
               if cand != node else ""))
    if isinstance(node, list):  # union
        branches = [b for b in node if b != "null"]
        if len(branches) == 1:
            return _convert(branches[0], path, defs, ns, memo)
        fields = []
        for b in branches:
            bname = b["name"] if isinstance(b, dict) and "name" in b else (
                b["type"] if isinstance(b, dict) else b
            )
            fields.append(T.StructField(
                f"member_{bname}", _convert(b, path, defs, ns, memo), True))
        return T.StructType(fields)
    if not isinstance(node, dict):
        raise TypeError(f"bad avro node: {node!r}")

    typ = node["type"]
    logical = node.get("logicalType")
    if logical:
        if logical == "decimal":
            return T.DecimalType(node.get("precision", 10), node.get("scale", 0))
        key = (typ if isinstance(typ, str) else "", logical)
        if key in _LOGICAL:
            return _LOGICAL[key]
        # unknown logical type → fall through to the carrier type
    if typ == "record":
        bare, full, ns_here = _register_named(node, ns, defs)
        rpath = path + (full,)
        return T.StructType(
            [
                T.StructField(f["name"],
                              _convert(f["type"], rpath, defs, ns_here, memo),
                              _nullable(f["type"]))
                for f in node["fields"]
            ]
        )
    if typ == "array":
        return T.ArrayType(_convert(node["items"], path, defs, ns, memo),
                           _nullable(node["items"]))
    if typ == "map":
        return T.MapType(T.StringType(),
                         _convert(node["values"], path, defs, ns, memo),
                         _nullable(node["values"]))
    if typ == "enum":
        _register_named(node, ns, defs)
        return T.StringType()
    if typ == "fixed":
        _register_named(node, ns, defs)
        return T.BinaryType()
    return _convert(typ, path, defs, ns, memo)


def _nullable(avro_type) -> bool:
    return isinstance(avro_type, list) and "null" in avro_type


def struct_to_avro(dt: T.DataType, name: str = "topLevelRecord", _ns: list | None = None):
    """Catalyst DataType → Avro schema dict (the writer schema
    ``to_avro`` needs). Nullable fields become ``["null", T]`` unions."""
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": name,
            "fields": [
                {
                    "name": f.name,
                    "type": (
                        ["null", struct_to_avro(f.dataType, f"{name}_{f.name}")]
                        if f.nullable
                        else struct_to_avro(f.dataType, f"{name}_{f.name}")
                    ),
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        inner = struct_to_avro(dt.elementType, f"{name}_item")
        return {"type": "array", "items": ["null", inner] if dt.containsNull else inner}
    if isinstance(dt, T.MapType):
        inner = struct_to_avro(dt.valueType, f"{name}_value")
        return {"type": "map", "values": ["null", inner] if dt.valueContainsNull else inner}
    if isinstance(dt, T.DecimalType):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": dt.precision, "scale": dt.scale}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    for prim, spark_t in _PRIMITIVES.items():
        if dt == spark_t:
            return prim
    if isinstance(dt, (T.ByteType, T.ShortType)):
        return "int"
    raise TypeError(f"no avro mapping for {dt.simpleString()}")


def eliminate_recursion(schema, max_depth: int = 0):
    """AvroRecursionEliminatingConverter.java:42 — return a copy of the
    Avro schema with recursive re-entries removed. ``max_depth`` is how
    many times a named record may re-enter itself before the recurring
    field is dropped (0 = drop on first re-entry, the reference's
    behavior). Returns (schema, dropped_field_paths)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    dropped: list[str] = []
    defs: dict[str, dict] = {}  # named record types seen on the walk

    def walk(node, seen: dict, path: str):
        if isinstance(node, str):
            if node in defs:  # named re-entry: truncate or inline a copy
                if seen.get(node, 0) > max_depth:
                    return None
                inlined = walk(defs[node], seen, path)
                if isinstance(inlined, dict):  # rename: Avro forbids dup defs
                    inlined = dict(inlined, name=f"{node}_d{seen.get(node, 0) + 1}")
                return inlined
            return node
        if isinstance(node, list):
            out = [walk(b, seen, path) for b in node]
            out = [b for b in out if b is not None]
            # a union reduced to nothing-but-null carries no data: drop it
            if not out or all(b == "null" for b in out):
                return None
            return out
        if not isinstance(node, dict):
            return node
        typ = node.get("type")
        if typ == "record":
            name = node["name"]
            if seen.get(name, 0) > max_depth:
                return None
            defs.setdefault(name, node)
            seen2 = dict(seen)
            seen2[name] = seen2.get(name, 0) + 1
            fields = []
            for f in node["fields"]:
                fpath = f"{path}.{f['name']}" if path else f["name"]
                ft = walk(f["type"], seen2, fpath)
                if ft is None:
                    dropped.append(fpath)
                    continue
                fields.append(dict(f, type=ft))
            return dict(node, fields=fields)
        if typ == "array":
            items = walk(node["items"], seen, path)
            return None if items is None else dict(node, items=items)
        if typ == "map":
            values = walk(node["values"], seen, path)
            return None if values is None else dict(node, values=values)
        if isinstance(typ, (dict, list, str)) and typ not in ("enum", "fixed"):
            inner = walk(typ, seen, path)
            return None if inner is None else dict(node, type=inner)
        return node

    return walk(schema, {}, ""), dropped


_PROMOTIONS = {
    T.IntegerType(): {T.LongType(), T.FloatType(), T.DoubleType()},
    T.LongType(): {T.FloatType(), T.DoubleType()},
    T.FloatType(): {T.DoubleType()},
    T.ByteType(): {T.ShortType(), T.IntegerType(), T.LongType()},
    T.ShortType(): {T.IntegerType(), T.LongType()},
}


def is_compatible(reader: T.DataType, writer: T.DataType) -> bool:
    """Can data written with *writer* be read as *reader*? Standard Avro
    resolution: identical types, numeric promotions, struct-by-field
    with missing-in-writer fields allowed only if reader-nullable."""
    if reader == writer:
        return True
    if writer in _PROMOTIONS and reader in _PROMOTIONS[writer]:
        return True
    if isinstance(reader, T.StructType) and isinstance(writer, T.StructType):
        wfields = {f.name: f for f in writer.fields}
        for rf in reader.fields:
            wf = wfields.get(rf.name)
            if wf is None:
                if not rf.nullable:
                    return False
                continue
            if not is_compatible(rf.dataType, wf.dataType):
                return False
        return True
    if isinstance(reader, T.ArrayType) and isinstance(writer, T.ArrayType):
        return is_compatible(reader.elementType, writer.elementType)
    if isinstance(reader, T.MapType) and isinstance(writer, T.MapType):
        return is_compatible(reader.valueType, writer.valueType)
    return False


def conform_to(df, target: T.StructType, strict: bool = False):
    """Evolve *df* to *target* (in-flight schema change, SURVEY §2.11):
    missing nullable target fields are added as nulls, compatible types
    are up-cast (int→long etc.), extra columns are dropped (or rejected
    when ``strict``). The batch-boundary half of streaming schema
    evolution — each epoch conforms to the registry's latest before
    appending, so one directory holds one schema."""
    from pyspark.sql import functions as F

    have = {f.name: f for f in df.schema.fields}
    cols = []
    for tf in target.fields:
        wf = have.get(tf.name)
        if wf is None:
            if not tf.nullable:
                raise ValueError(f"missing required column `{tf.name}`")
            cols.append(F.lit(None).cast(tf.dataType).alias(tf.name))
            continue
        if wf.dataType == tf.dataType:
            cols.append(F.col(tf.name))
        elif is_compatible(tf.dataType, wf.dataType):
            cols.append(F.col(tf.name).cast(tf.dataType).alias(tf.name))
        else:
            raise ValueError(
                f"column `{tf.name}`: {wf.dataType.simpleString()} cannot evolve "
                f"to {tf.dataType.simpleString()}"
            )
    extras = [n for n in have if n not in {f.name for f in target.fields}]
    if extras and strict:
        raise ValueError(f"unexpected columns: {extras}")
    return df.select(*cols)


def evolve_union(frames, strict: bool = False):
    """Union epochs/files with heterogeneous (but compatible) schemas:
    the union target is the widest schema (every field, widest numeric
    type); each frame is conformed then unioned by name."""
    if not frames:
        raise ValueError("no frames")
    target_fields: dict[str, T.StructField] = {}
    for df in frames:
        for f in df.schema.fields:
            prev = target_fields.get(f.name)
            if prev is None:
                target_fields[f.name] = T.StructField(f.name, f.dataType, True)
            elif prev.dataType != f.dataType:
                if is_compatible(prev.dataType, f.dataType):
                    pass  # prev already the wider type
                elif is_compatible(f.dataType, prev.dataType):
                    target_fields[f.name] = T.StructField(f.name, f.dataType, True)
                else:
                    raise ValueError(
                        f"column `{f.name}`: irreconcilable types "
                        f"{prev.dataType.simpleString()} vs {f.dataType.simpleString()}"
                    )
    target = T.StructType(list(target_fields.values()))
    out = None
    for df in frames:
        conformed = conform_to(df, target, strict=strict)
        out = conformed if out is None else out.unionByName(conformed)
    return out


def primary_key_fields(avro_schema) -> list[str]:
    """AvroKeyMapper key discovery (gobblin-compaction/.../avro/
    AvroKeyMapper.java + MRCompactorAvroKeyDedupJobRunner's
    'primarykey' doc attribute): the dedup key columns declared in the
    schema itself — a top-level ``primarykey`` attribute (string or
    list), else any field whose ``doc`` contains ``primarykey``."""
    if isinstance(avro_schema, str):
        avro_schema = json.loads(avro_schema)
    pk = avro_schema.get("primarykey") or avro_schema.get("primaryKey")
    if pk:
        return [pk] if isinstance(pk, str) else list(pk)
    return [
        f["name"]
        for f in avro_schema.get("fields", [])
        if "primarykey" in str(f.get("doc", "")).lower()
    ]
