"""The shared mergeable-sketch protocol.

Every sketch implements the same five-method algebra, mirroring the
reference's init / insert / (implicit OR-union) / contains split
(SURVEY §2.1 O1/O4/O12/O6, /root/reference/fbloom/bloom.h:279-408):

    create(**cfg)            -> state        (O1: sizing + zeroed buffers)
    update(state, values)    -> state        (O4/O11: whole-column batch)
    merge(a, b)              -> new state    (O12: commutative + associative)
    serialize / deserialize  <-> bytes       (shuffle/broadcast wire format)
    query-specific methods per sketch        (O6 contains, cardinality, ...)

``update`` and ``merge`` must be associative/commutative up to the sketch's
equivalence (byte-equal for Bloom/HLL/CMS; estimate-equivalent for
KLL/t-digest) — property-tested in tests/test_merge_properties.py.

Serialization frame: magic ``SKB1`` + type tag + json header + raw numpy
buffers, so a state travels as a single BinaryType cell through Spark.
"""

from __future__ import annotations

import base64
import datetime
import json
import struct

import numpy as np

_MAGIC = b"SKB1"


def encode_keys(keys: list) -> list:
    """Sample/counter keys -> JSON-safe forms for the state header.

    Sketch keys are column values, i.e. scalars: JSON-native ones pass
    through; bytes / datetime / date (BinaryType / TimestampType /
    DateType columns) get a one-entry tag dict; numpy scalars unwrap to
    their python natives first.  Raw ``json.dumps(keys)`` crashed the
    whole Spark stage at partial-serialize time for any of those types
    even though update/merge handled them fine."""
    out = []
    for v in keys:
        if isinstance(v, np.generic):
            v = v.item()
        if isinstance(v, (bytes, bytearray)):
            out.append({"__b": base64.b64encode(bytes(v)).decode()})
        elif isinstance(v, datetime.datetime):
            out.append({"__t": v.isoformat()})
        elif isinstance(v, datetime.date):
            out.append({"__d": v.isoformat()})
        else:
            out.append(v)  # str/int/float/bool/None: JSON-native
    return out


def decode_keys(keys: list) -> list:
    """Inverse of encode_keys: restores values that compare equal to the
    originals, so a resumed/merged state dedupes against fresh batches."""
    out = []
    for v in keys:
        if isinstance(v, dict):
            if "__b" in v:
                out.append(base64.b64decode(v["__b"]))
            elif "__t" in v:
                out.append(datetime.datetime.fromisoformat(v["__t"]))
            elif "__d" in v:
                out.append(datetime.date.fromisoformat(v["__d"]))
            else:  # unknown tag: surface loudly, never silently corrupt
                raise ValueError(f"unknown key tag in sketch header: {v}")
        else:
            out.append(v)
    return out


def pack_state(kind: str, header: dict, buffers: list[np.ndarray]) -> bytes:
    """Frame: magic | kind(8s) | header_len u32 | header json |
    nbuf u8 | per-buffer (dtype str8, len u64, bytes)."""
    out = [_MAGIC, struct.pack("<8s", kind.encode()[:8].ljust(8, b"\0"))]
    hj = json.dumps(header, separators=(",", ":")).encode()
    out.append(struct.pack("<I", len(hj)))
    out.append(hj)
    out.append(struct.pack("<B", len(buffers)))
    for buf in buffers:
        b = np.ascontiguousarray(buf)
        dt = b.dtype.str.encode()[:8].ljust(8, b"\0")
        raw = b.tobytes()
        out.append(struct.pack("<8sQ", dt, len(raw)))
        out.append(raw)
    return b"".join(out)


def unpack_state(data: bytes) -> tuple[str, dict, list[np.ndarray]]:
    if data[:4] != _MAGIC:
        raise ValueError("not a sketch state blob")
    kind = struct.unpack_from("<8s", data, 4)[0].rstrip(b"\0").decode()
    (hlen,) = struct.unpack_from("<I", data, 12)
    pos = 16
    header = json.loads(data[pos : pos + hlen])
    pos += hlen
    (nbuf,) = struct.unpack_from("<B", data, pos)
    pos += 1
    buffers = []
    for _ in range(nbuf):
        dt, blen = struct.unpack_from("<8sQ", data, pos)
        pos += 16
        arr = np.frombuffer(data[pos : pos + blen], dtype=np.dtype(dt.rstrip(b"\0").decode())).copy()
        pos += blen
        buffers.append(arr)
    return kind, header, buffers


def peek_kind(data: bytes) -> str:
    if data[:4] != _MAGIC:
        raise ValueError("not a sketch state blob")
    return struct.unpack_from("<8s", data, 4)[0].rstrip(b"\0").decode()
