"""Dependency-free MaxMind DB (.mmdb) reader -> GeoIP range table.

The reference opens a GeoLite2-City database with the maxminddb crate and
looks up each event's IP (src/eventhandler.rs:44-45,72-84), keeping
country/city/subdivisions English names (src/event.rs:72-86). The
Spark-first plan here is the banded RANGE JOIN (operators/enrich.py), which
needs the database as a flat (lo, hi, country, city, subdivisions) table —
this module converts a real .mmdb file into exactly that, with no external
library: the MaxMind DB binary format is publicly specified
(https://maxmind.github.io/MaxMind-DB/) and small enough to decode directly.

Layout per the spec:

- binary search tree of ``node_count`` nodes, two ``record_size``-bit
  records each (24/28/32 bits); record < node_count -> child node,
  == node_count -> no data, > node_count -> data at
  ``record - node_count + tree_size`` in the file;
- a 16-byte zero separator, then the data section (tagged values:
  pointer/utf8/double/bytes/uint/map/int32/array/bool/float);
- metadata: a map after the last occurrence of
  ``\\xab\\xcd\\xefMaxMind.com``.

IPv4 databases walk a 32-deep tree; IPv6 databases store IPv4 at ::/96, so
the converter descends 96 left edges first and enumerates that subtree.
Enumeration is a linear walk over the tree — a one-time driver-side (or
per-executor) conversion, after which enrichment is the broadcast range
join with zero per-row Python.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR_SIZE = 16


class MmdbReader:
    """Minimal decoder for the public MaxMind DB format."""

    def __init__(self, buf: bytes):
        self.buf = buf
        meta_start = buf.rindex(_METADATA_MARKER) + len(_METADATA_MARKER)
        self.metadata, _ = self._decode(meta_start, base=meta_start)
        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])
        self.ip_version = int(self.metadata["ip_version"])
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_start = self.tree_size + _DATA_SEPARATOR_SIZE

    @classmethod
    def open(cls, path: str) -> "MmdbReader":
        with open(path, "rb") as f:
            return cls(f.read())

    # -- search tree --------------------------------------------------------

    def record(self, node: int, side: int) -> int:
        """The left (0) or right (1) record of a node."""
        base = node * self.node_bytes
        rs = self.record_size
        if rs == 24:
            o = base + side * 3
            return int.from_bytes(self.buf[o : o + 3], "big")
        if rs == 28:
            middle = self.buf[base + 3]
            if side == 0:
                return ((middle >> 4) << 24) | int.from_bytes(self.buf[base : base + 3], "big")
            return ((middle & 0x0F) << 24) | int.from_bytes(self.buf[base + 4 : base + 7], "big")
        if rs == 32:
            o = base + side * 4
            return int.from_bytes(self.buf[o : o + 4], "big")
        raise ValueError(f"unsupported record size {rs}")

    # -- data section -------------------------------------------------------

    def _decode(self, offset: int, base: int | None = None) -> tuple[Any, int]:
        """Decode one tagged value at absolute ``offset``; pointers resolve
        relative to ``base`` (the data-section start unless overridden for
        metadata)."""
        if base is None:
            base = self.data_start
        buf = self.buf
        ctrl = buf[offset]
        offset += 1
        type_ = ctrl >> 5
        size = ctrl & 0x1F
        if type_ == 1:  # pointer — size bits encode width + value prefix
            psize = (size >> 3) & 0x3
            prefix = size & 0x7
            raw = buf[offset : offset + psize + 1]
            offset += psize + 1
            if psize == 0:
                ptr = (prefix << 8) | raw[0]
            elif psize == 1:
                ptr = ((prefix << 16) | int.from_bytes(raw, "big")) + 2048
            elif psize == 2:
                ptr = ((prefix << 24) | int.from_bytes(raw, "big")) + 526336
            else:
                ptr = int.from_bytes(raw, "big")
            # resolve against the CALLER'S base, not a hardcoded
            # data_start: during metadata decode data_start is not even
            # assigned yet, and a spec-violating metadata pointer would
            # otherwise crash instead of resolving within its section
            value, _ = self._decode(base + ptr, base)
            return value, offset
        if type_ == 0:  # extended type in next byte
            type_ = 7 + buf[offset]
            offset += 1
        if size == 29:
            size = 29 + buf[offset]
            offset += 1
        elif size == 30:
            size = 285 + int.from_bytes(buf[offset : offset + 2], "big")
            offset += 2
        elif size == 31:
            size = 65821 + int.from_bytes(buf[offset : offset + 3], "big")
            offset += 3

        if type_ == 2:  # utf8
            return buf[offset : offset + size].decode("utf-8"), offset + size
        if type_ == 3:  # double
            return struct.unpack(">d", buf[offset : offset + 8])[0], offset + 8
        if type_ == 4:  # bytes
            return bytes(buf[offset : offset + size]), offset + size
        if type_ in (5, 6, 9, 10):  # uint16/32/64/128
            return int.from_bytes(buf[offset : offset + size], "big"), offset + size
        if type_ == 7:  # map
            out = {}
            for _ in range(size):
                k, offset = self._decode(offset, base)
                v, offset = self._decode(offset, base)
                out[k] = v
            return out, offset
        if type_ == 8:  # int32
            # the spec stores int32 in 0-4 bytes ZERO-extended: reference
            # readers right-justify to 4 bytes before the signed unpack,
            # so a 1-byte 0xFF is 255, not -1 — only a full-width value
            # with bit 31 set is negative
            raw32 = buf[offset : offset + size].rjust(4, b"\x00")
            return struct.unpack(">i", raw32)[0], offset + size
        if type_ == 11:  # array
            out = []
            for _ in range(size):
                v, offset = self._decode(offset, base)
                out.append(v)
            return out, offset
        if type_ == 14:  # boolean — size IS the value
            return bool(size), offset
        if type_ == 15:  # float
            return struct.unpack(">f", buf[offset : offset + 4])[0], offset + 4
        raise ValueError(f"unsupported mmdb type {type_}")

    def data_at(self, record_value: int) -> Any:
        value, _ = self._decode(record_value - self.node_count + self.tree_size)
        return value

    # -- enumeration --------------------------------------------------------

    def _ipv4_root(self) -> int:
        """IPv6 trees keep IPv4 at ::/96: follow 96 left edges."""
        node = 0
        if self.ip_version == 4:
            return node
        for _ in range(96):
            node = self.record(node, 0)
            if node >= self.node_count:
                raise ValueError("no IPv4 subtree at ::/96")
        return node

    def lookup_ipv4(self, ipn: int) -> Any | None:
        """Point lookup: walk the tree along the 32 address bits
        (the maxminddb reader's lookup, src/eventhandler.rs:75)."""
        node = self._ipv4_root()
        for i in range(31, -1, -1):
            node = self.record(node, (ipn >> i) & 1)
            if node == self.node_count:
                return None
            if node > self.node_count:
                return self.data_at(node)
        return None

    def ipv4_networks(self) -> Iterator[tuple[int, int, Any]]:
        """Yield (lo_u32, hi_u32, record_dict) for every IPv4 network —
        an iterative DFS over the tree (no recursion limit risk)."""
        stack = [(self._ipv4_root(), 0, 0)]  # (node, prefix_bits, depth)
        while stack:
            node, prefix, depth = stack.pop()
            for side in (1, 0):
                rec = self.record(node, side)
                child_prefix = (prefix << 1) | side
                if rec < self.node_count:
                    if depth + 1 <= 32:
                        stack.append((rec, child_prefix, depth + 1))
                elif rec > self.node_count:
                    lo = child_prefix << (32 - depth - 1)
                    hi = lo + (1 << (32 - depth - 1)) - 1
                    yield lo, hi, self.data_at(rec)


def _en(names: dict | None) -> str | None:
    return names.get("en") if isinstance(names, dict) else None


def geoip_city_record(data: dict) -> tuple[str | None, str | None, list[str]]:
    """GeoLite2-City record -> the reference's (country, city, subdivisions)
    English-name triple (src/event.rs:72-86)."""
    country = _en((data.get("country") or {}).get("names"))
    city = _en((data.get("city") or {}).get("names"))
    subdivisions = [
        s
        for s in (_en((sub or {}).get("names")) for sub in data.get("subdivisions") or [])
        if s is not None
    ]
    return country, city, subdivisions


def mmdb_to_range_rows(path: str) -> list[tuple[int, int, str | None, str | None, list[str]]]:
    """Convert a GeoLite2-City .mmdb into range-table rows
    (lo, hi, country, city, subdivisions) — the dim consumed by
    ``operators.enrich.enrich_geoip_banded``."""
    reader = MmdbReader.open(path)
    rows = []
    for lo, hi, data in reader.ipv4_networks():
        country, city, subs = geoip_city_record(data)
        rows.append((lo, hi, country, city, subs))
    rows.sort(key=lambda r: r[0])
    return rows


def mmdb_to_range_df(spark, path: str):
    """The range dim as a DataFrame, ready for the banded broadcast join."""
    return spark.createDataFrame(
        mmdb_to_range_rows(path),
        "lo bigint, hi bigint, country string, city string, subdivisions array<string>",
    )
