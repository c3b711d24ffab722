"""Shared test helper: build REAL google.protobuf message classes from
protowire schema dicts.

Gives every protowire schema a genuine second implementation (the google
runtime) without protoc: schemas are walked recursively (handling the
self-referencing FilterExpression/PathQuery dicts), converted to dynamic
descriptors, and exposed as message classes keyed by root name.
"""

from __future__ import annotations

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

T = descriptor_pb2.FieldDescriptorProto

_SCALARS = {
    "string": T.TYPE_STRING,
    "bytes": T.TYPE_BYTES,
    "bool": T.TYPE_BOOL,
    "int32": T.TYPE_INT32,
    "int64": T.TYPE_INT64,
    "uint32": T.TYPE_UINT32,
    "uint64": T.TYPE_UINT64,
    "float": T.TYPE_FLOAT,
    "double": T.TYPE_DOUBLE,
    "fixed64": T.TYPE_FIXED64,
    "enum": T.TYPE_INT32,  # enums are int32 varints on the wire
}

_counter = [0]


def build_messages(roots: dict[str, dict], package: str = None):
    """roots: name -> protowire schema dict. Returns {name: message class}
    for every registered schema (roots and the nested ones, with
    synthesized names)."""
    _counter[0] += 1
    package = package or f"pwtest{_counter[0]}"
    names: dict[int, str] = {}
    schemas: dict[str, dict] = {}

    def register(schema: dict, hint: str) -> str:
        sid = id(schema)
        if sid in names:
            return names[sid]
        name = hint
        n = 1
        while name in schemas:
            n += 1
            name = f"{hint}{n}"
        names[sid] = name
        schemas[name] = schema
        for fname, (_num, kind) in schema.items():
            _walk(kind, f"{name}_{fname}")
        return name

    def _walk(kind, hint):
        if isinstance(kind, tuple):
            if kind[0] == "msg":
                register(kind[1], hint)
            elif kind[0] == "rep":
                _walk(kind[1], hint)
            elif kind[0] == "map":
                _walk(kind[2], f"{hint}_value")

    # claim root names first so a root referenced from another root's field
    # (e.g. SearchResponse.graph -> GraphSearchResponse) keeps its own name
    for name, schema in roots.items():
        if id(schema) not in names:
            names[id(schema)] = name
            schemas[name] = schema
    for name, schema in roots.items():
        for fname, (_num, kind) in schema.items():
            _walk(kind, f"{name}_{fname}")

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = f"{package}.proto"
    fdp.package = package
    fdp.syntax = "proto3"

    for name, schema in schemas.items():
        m = fdp.message_type.add()
        m.name = name
        for fname, (num, kind) in schema.items():
            rep = False
            if isinstance(kind, tuple) and kind[0] == "rep":
                rep, kind = True, kind[1]
            if isinstance(kind, tuple) and kind[0] == "map":
                _, kk, vk = kind
                entry = m.nested_type.add()
                entry.name = "".join(p.title() for p in fname.split("_")) + "Entry"
                entry.options.map_entry = True
                k = entry.field.add()
                k.name, k.number, k.label = "key", 1, T.LABEL_OPTIONAL
                k.type = _SCALARS[kk]
                v = entry.field.add()
                v.name, v.number, v.label = "value", 2, T.LABEL_OPTIONAL
                if isinstance(vk, tuple) and vk[0] == "msg":
                    v.type = T.TYPE_MESSAGE
                    v.type_name = f".{package}.{names[id(vk[1])]}"
                else:
                    v.type = _SCALARS[vk]
                f = m.field.add()
                f.name, f.number, f.label = fname, num, T.LABEL_REPEATED
                f.type = T.TYPE_MESSAGE
                f.type_name = f".{package}.{name}.{entry.name}"
                continue
            f = m.field.add()
            f.name = fname
            f.number = num
            f.label = T.LABEL_REPEATED if rep else T.LABEL_OPTIONAL
            if isinstance(kind, tuple) and kind[0] == "msg":
                f.type = T.TYPE_MESSAGE
                f.type_name = f".{package}.{names[id(kind[1])]}"
            else:
                f.type = _SCALARS[kind]
                if not rep:
                    # declare singular scalars proto3-optional (synthetic
                    # oneof) so explicit defaults round-trip — the reference
                    # protos use `optional` scalars with presence semantics
                    # (e.g. GraphQuery.Node.node_type)
                    oneof = m.oneof_decl.add()
                    oneof.name = f"_{fname}"
                    f.oneof_index = len(m.oneof_decl) - 1
                    f.proto3_optional = True

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return {
        name: message_factory.GetMessageClass(
            pool.FindMessageTypeByName(f"{package}.{name}")
        )
        for name in schemas
    }


def fill(pb_msg, data: dict):
    """Recursively fill a dynamic message from a protowire-style dict."""
    for fname, value in data.items():
        fd = pb_msg.DESCRIPTOR.fields_by_name[fname]
        if fd.label == fd.LABEL_REPEATED:
            if fd.message_type is not None and fd.message_type.GetOptions().map_entry:
                vfd = fd.message_type.fields_by_name["value"]
                for k, v in value.items():
                    if vfd.message_type is not None:
                        fill(getattr(pb_msg, fname)[k], v)
                    else:
                        getattr(pb_msg, fname)[k] = v
            elif fd.message_type is not None:
                for item in value:
                    fill(getattr(pb_msg, fname).add(), item)
            else:
                getattr(pb_msg, fname).extend(value)
        elif fd.message_type is not None:
            sub = getattr(pb_msg, fname)
            sub.SetInParent()  # mark presence even for empty submessages
            fill(sub, value)
        else:
            setattr(pb_msg, fname, value)


def to_dict(pb_msg) -> dict:
    """Dynamic message -> protowire-style dict of the SET fields only
    (mirrors protowire.decode: defaults absent unless on the wire)."""
    out = {}
    for fd, value in pb_msg.ListFields():
        if fd.label == fd.LABEL_REPEATED:
            if fd.message_type is not None and fd.message_type.GetOptions().map_entry:
                vfd = fd.message_type.fields_by_name["value"]
                out[fd.name] = {
                    k: (to_dict(v) if vfd.message_type is not None else v)
                    for k, v in value.items()
                }
            elif fd.message_type is not None:
                out[fd.name] = [to_dict(v) for v in value]
            else:
                out[fd.name] = list(value)
        elif fd.message_type is not None:
            out[fd.name] = to_dict(value)
        else:
            out[fd.name] = value
    return out
