"""Hand-rolled protobuf (proto3) wire codec + nidx message schemas.

The reference's gRPC surface speaks protobuf (nidx_protos/nidx.proto:8-34,
nodereader.proto:388-476). protoc is not available in this image, so the
wire format is emitted/parsed directly from declarative schemas — enough
for reference clients to call the top RPCs (NidxApi GetShard/NewShard/
DeleteShard/ListShards, NidxSearcher Search/Suggest) against this node.

Schema model: a message schema is a dict ``name -> (field_number, kind)``:

- scalar kinds: "string", "bytes", "bool", "int32", "int64", "uint32",
  "uint64", "float", "double", "enum"
- ("msg", SCHEMA): nested message
- ("rep", kind): repeated field (numeric scalars packed, proto3 default;
  strings/bytes/messages one record per element)
- ("map", key_kind, value_kind): map field (wire = repeated {1:k, 2:v})

Values are plain python dicts; encode skips absent/None fields (proto3
implicit presence), decode skips unknown fields and returns defaults only
for fields present on the wire (callers use .get with defaults).

Tests validate byte-for-byte against the real google.protobuf runtime via
dynamically built descriptors (tests/test_protowire.py).
"""

from __future__ import annotations

import struct
from typing import Any

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value += 1 << 64  # two's complement over 64 bits (int32/int64 negatives)
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _tag(num: int, wire_type: int) -> bytes:
    out = bytearray()
    _write_varint(out, (num << 3) | wire_type)
    return bytes(out)


_VARINT_KINDS = {"bool", "int32", "int64", "uint32", "uint64", "enum"}


def _encode_scalar(out: bytearray, kind: str, value: Any) -> None:
    if kind in _VARINT_KINDS:
        _write_varint(out, int(value))
    elif kind == "float":
        out += struct.pack("<f", float(value))
    elif kind == "double":
        out += struct.pack("<d", float(value))
    elif kind == "fixed64":
        out += struct.pack("<Q", int(value))
    elif kind == "string":
        b = value.encode("utf-8")
        _write_varint(out, len(b))
        out += b
    elif kind == "bytes":
        _write_varint(out, len(value))
        out += bytes(value)
    else:
        raise ValueError(f"bad scalar kind {kind}")


def _scalar_wire_type(kind: str) -> int:
    if kind in _VARINT_KINDS:
        return 0
    if kind in ("double", "fixed64"):
        return 1
    if kind == "float":
        return 5
    return 2  # string/bytes/msg


def _is_default(kind, value) -> bool:
    """proto3 implicit presence: default-valued singular fields are omitted."""
    if isinstance(kind, tuple):
        return False  # messages/repeated handled by caller
    if kind in _VARINT_KINDS or kind == "fixed64":
        return int(value) == 0
    if kind in ("float", "double"):
        return float(value) == 0.0
    return len(value) == 0


def encode(schema: dict, msg: dict) -> bytes:
    out = bytearray()
    for name, (num, kind) in schema.items():
        value = msg.get(name)
        if value is None:
            continue
        if isinstance(kind, tuple) and kind[0] == "rep":
            inner = kind[1]
            if not value:
                continue
            if isinstance(inner, tuple) and inner[0] == "msg":
                for item in value:
                    body = encode(inner[1], item)
                    out += _tag(num, 2)
                    _write_varint(out, len(body))
                    out += body
            elif inner in ("string", "bytes"):
                for item in value:
                    out += _tag(num, 2)
                    _encode_scalar(out, inner, item)
            else:  # packed numeric (proto3 default)
                body = bytearray()
                for item in value:
                    _encode_scalar(body, inner, item)
                out += _tag(num, 2)
                _write_varint(out, len(body))
                out += body
        elif isinstance(kind, tuple) and kind[0] == "map":
            _, kk, vk = kind
            entry_schema = {"key": (1, kk), "value": (2, vk)}
            for k, v in value.items():
                body = encode(entry_schema, {"key": k, "value": v})
                out += _tag(num, 2)
                _write_varint(out, len(body))
                out += body
        elif isinstance(kind, tuple) and kind[0] == "msg":
            body = encode(kind[1], value)
            out += _tag(num, 2)
            _write_varint(out, len(body))
            out += body
        else:
            if _is_default(kind, value):
                continue
            out += _tag(num, _scalar_wire_type(kind))
            _encode_scalar(out, kind, value)
    return bytes(out)


def _check_len(data: bytes, pos: int, n: int) -> None:
    # a short slice past the end must be a codec error, not silently
    # truncated bytes/strings handed to the caller
    if pos + n > len(data):
        raise ValueError("truncated message (field extends past end)")


def _decode_scalar(kind: str, data: bytes, pos: int, wire_type: int):
    if kind in _VARINT_KINDS:
        v, pos = _read_varint(data, pos)
        if kind == "bool":
            return bool(v), pos
        if kind in ("int32", "int64") and v >= 1 << 63:
            v -= 1 << 64
        return v, pos
    if kind == "float":
        _check_len(data, pos, 4)
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if kind == "double":
        _check_len(data, pos, 8)
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if kind == "fixed64":
        _check_len(data, pos, 8)
        return struct.unpack_from("<Q", data, pos)[0], pos + 8
    # length-delimited
    n, pos = _read_varint(data, pos)
    _check_len(data, pos, n)
    raw = data[pos : pos + n]
    pos += n
    return (raw.decode("utf-8") if kind == "string" else bytes(raw)), pos


def _skip(data: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = _read_varint(data, pos)
        return pos
    if wire_type == 1:
        _check_len(data, pos, 8)
        return pos + 8
    if wire_type == 5:
        _check_len(data, pos, 4)
        return pos + 4
    if wire_type == 2:
        n, pos = _read_varint(data, pos)
        _check_len(data, pos, n)
        return pos + n
    raise ValueError(f"unsupported wire type {wire_type}")


def decode(schema: dict, data: bytes) -> dict:
    by_num = {num: (name, kind) for name, (num, kind) in schema.items()}
    msg: dict = {}
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        num, wire_type = key >> 3, key & 7
        entry = by_num.get(num)
        if entry is None:
            pos = _skip(data, pos, wire_type)
            continue
        name, kind = entry
        if isinstance(kind, tuple) and kind[0] == "rep":
            inner = kind[1]
            target = msg.setdefault(name, [])
            if isinstance(inner, tuple) and inner[0] == "msg":
                n, pos = _read_varint(data, pos)
                _check_len(data, pos, n)
                target.append(decode(inner[1], data[pos : pos + n]))
                pos += n
            elif inner in ("string", "bytes"):
                v, pos = _decode_scalar(inner, data, pos, wire_type)
                target.append(v)
            elif wire_type == 2:  # packed numeric run
                n, pos = _read_varint(data, pos)
                end = pos + n
                while pos < end:
                    v, pos = _decode_scalar(inner, data, pos, 0)
                    target.append(v)
            else:  # unpacked numeric element (proto2 emitters)
                v, pos = _decode_scalar(inner, data, pos, wire_type)
                target.append(v)
        elif isinstance(kind, tuple) and kind[0] == "map":
            _, kk, vk = kind
            n, pos = _read_varint(data, pos)
            _check_len(data, pos, n)
            entry_schema = {"key": (1, kk), "value": (2, vk)}
            item = decode(entry_schema, data[pos : pos + n])
            pos += n
            default_key = "" if kk == "string" else 0
            msg.setdefault(name, {})[item.get("key", default_key)] = item.get("value")
        elif isinstance(kind, tuple) and kind[0] == "msg":
            n, pos = _read_varint(data, pos)
            _check_len(data, pos, n)
            msg[name] = decode(kind[1], data[pos : pos + n])
            pos += n
        else:
            v, pos = _decode_scalar(kind, data, pos, wire_type)
            msg[name] = v
    return msg


# ---------------------------------------------------------------------------
# nidx message schemas (field numbers from /root/reference/nidx/nidx_protos)
# ---------------------------------------------------------------------------

# noderesources.proto
SHARD_ID = {"id": (1, "string")}
SHARD_IDS = {"ids": (1, ("rep", ("msg", SHARD_ID)))}
SHARD_CREATED = {"id": (1, "string")}
EMPTY_QUERY: dict = {}
SHARD = {
    "shard_id": (1, "string"),
    "fields": (2, "uint64"),
    "paragraphs": (3, "uint64"),
    "sentences": (4, "uint64"),
    "size_bytes": (6, "uint64"),
}
POSITION = {"index": (1, "uint64"), "start": (2, "uint64"), "end": (3, "uint64")}
SENTENCE_METADATA = {
    "position": (1, ("msg", POSITION)),
    "page_with_visual": (2, "bool"),
}

# utils.proto
SECURITY = {"access_groups": (1, ("rep", "string"))}

# nodewriter.proto
VECTOR_INDEX_CONFIG = {
    "similarity": (1, "enum"),  # COSINE=0, DOT=1
    "normalize_vectors": (2, "bool"),
    "vector_type": (3, "enum"),  # DENSE_F32=0
    "vector_dimension": (4, "uint32"),
}
NEW_SHARD_REQUEST = {
    "kbid": (2, "string"),
    "vectorsets_configs": (6, ("map", "string", ("msg", VECTOR_INDEX_CONFIG))),
    "prewarm_enabled": (7, "bool"),
    "features": (10, ("rep", "string")),
}
OP_STATUS = {"status": (1, "enum"), "detail": (2, "string")}

# nodereader.proto
GET_SHARD_REQUEST = {
    "shard_id": (1, ("msg", SHARD_ID)),
    "vectorset": (2, "string"),
}
FACETED = {"labels": (1, ("rep", "string"))}
ORDER_BY = {
    "type": (2, "enum"),  # DESC=0, ASC=1
    "sort_by": (3, "enum"),  # CREATED=0, MODIFIED=1
}
SEARCH_REQUEST = {
    "shard_ids": (1, ("rep", "string")),
    "body": (3, "string"),
    "order": (5, ("msg", ORDER_BY)),
    "faceted": (6, ("msg", FACETED)),
    "result_per_page": (8, "int32"),
    "vector": (10, ("rep", "float")),
    "paragraph": (12, "bool"),
    "document": (13, "bool"),
    "with_duplicates": (14, "bool"),
    "vectorset": (15, "string"),
    "only_faceted": (16, "bool"),
    "min_score_semantic": (23, "float"),
    "security": (24, ("msg", SECURITY)),
    "min_score_bm25": (25, "float"),
}
FACET_RESULT = {"tag": (1, "string"), "total": (2, "int32")}
FACET_RESULTS = {"facetresults": (1, ("rep", ("msg", FACET_RESULT)))}
RESULT_SCORE = {"bm25": (1, "float"), "docaddr": (3, "uint64")}
DOCUMENT_RESULT = {
    "uuid": (1, "string"),
    "score": (3, ("msg", RESULT_SCORE)),
    "field": (4, "string"),
    "labels": (5, ("rep", "string")),
}
DOCUMENT_SEARCH_RESPONSE = {
    "total": (1, "int32"),
    "results": (2, ("rep", ("msg", DOCUMENT_RESULT))),
    "facets": (3, ("map", "string", ("msg", FACET_RESULTS))),
    "query": (6, "string"),
    "next_page": (7, "bool"),
}
PARAGRAPH_RESULT = {
    "uuid": (1, "string"),
    "field": (3, "string"),
    "start": (4, "uint64"),
    "end": (5, "uint64"),
    "paragraph": (6, "string"),
    "split": (7, "string"),
    "index": (8, "uint64"),
    "score": (9, ("msg", RESULT_SCORE)),
    "matches": (10, ("rep", "string")),
    "labels": (12, ("rep", "string")),
}
PARAGRAPH_SEARCH_RESPONSE = {
    "total": (1, "int32"),
    "results": (2, ("rep", ("msg", PARAGRAPH_RESULT))),
    "facets": (3, ("map", "string", ("msg", FACET_RESULTS))),
    "query": (6, "string"),
    "next_page": (7, "bool"),
    "ematches": (9, ("rep", "string")),
}
DOCUMENT_VECTOR_IDENTIFIER = {"id": (1, "string")}
DOCUMENT_SCORED = {
    "doc_id": (1, ("msg", DOCUMENT_VECTOR_IDENTIFIER)),
    "score": (2, "float"),
    "metadata": (3, ("msg", SENTENCE_METADATA)),
    "labels": (4, ("rep", "string")),
}
VECTOR_SEARCH_RESPONSE = {"documents": (1, ("rep", ("msg", DOCUMENT_SCORED)))}
SEARCH_RESPONSE = {
    "document": (1, ("msg", DOCUMENT_SEARCH_RESPONSE)),
    "paragraph": (2, ("msg", PARAGRAPH_SEARCH_RESPONSE)),
    "vector": (3, ("msg", VECTOR_SEARCH_RESPONSE)),
    "shard_ids": (6, ("rep", "string")),
}
SUGGEST_REQUEST = {
    "shard_ids": (1, ("rep", "string")),
    "body": (2, "string"),
    "features": (6, ("rep", "enum")),  # ENTITIES=0, PARAGRAPHS=1
    "top_k": (11, "uint32"),
}
SUGGEST_RESPONSE = {
    "total": (1, "int32"),
    "results": (2, ("rep", ("msg", PARAGRAPH_RESULT))),
    "query": (3, "string"),
    "ematches": (4, ("rep", "string")),
    "shard_ids": (7, ("rep", "string")),
}


# nidx.proto ConfigureShards (nidx.proto:13, ShardsConfig/ShardConfig)
SHARD_CONFIG = {
    "shard_id": (1, "string"),
    "prewarm_enabled": (2, "bool"),
}
SHARDS_CONFIG = {"configs": (1, ("rep", ("msg", SHARD_CONFIG)))}

# noderesources.proto VectorSetID/VectorSetList (noderesources.proto:108-116)
VECTOR_SET_ID = {
    "shard": (1, ("msg", SHARD_ID)),
    "vectorset": (2, "string"),
}
VECTOR_SET_LIST = {
    "shard": (1, ("msg", SHARD_ID)),
    "vectorsets": (2, ("rep", "string")),
}

# nodewriter.proto NewVectorSetRequest (nodewriter.proto:73-78)
NEW_VECTOR_SET_REQUEST = {
    "id": (1, ("msg", VECTOR_SET_ID)),
    "config": (4, ("msg", VECTOR_INDEX_CONFIG)),
}

# nidx.proto ExtractedTexts (nidx.proto:25, :64-94)
ET_FIELD_ID = {
    "rid": (1, "string"),
    "field_type": (2, "string"),
    "field_name": (3, "string"),
    "split": (4, "string"),
}
ET_PARAGRAPH_ID = {
    "rid": (1, "string"),
    "field_type": (2, "string"),
    "field_name": (3, "string"),
    "split": (4, "string"),
    "paragraph_start": (5, "uint32"),
    "paragraph_end": (6, "uint32"),
}
EXTRACTED_TEXTS_REQUEST = {
    "shard_id": (1, "string"),
    "field_ids": (2, ("rep", ("msg", ET_FIELD_ID))),
    "paragraph_ids": (3, ("rep", ("msg", ET_PARAGRAPH_ID))),
}
EXTRACTED_TEXTS_RESPONSE = {
    "fields": (1, ("map", "string", "string")),
    "splits": (2, ("map", "string", "string")),
    "paragraphs": (3, ("map", "string", "string")),
}
