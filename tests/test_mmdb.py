"""MaxMind DB converter tests (S5): a synthetic .mmdb is hand-encoded per
the PUBLIC MaxMind-DB format spec (https://maxmind.github.io/MaxMind-DB/),
then decoded back by the dependency-free reader and fed through the banded
GeoIP range join — proving a real GeoLite2 file would drive enrichment
end-to-end (src/eventhandler.rs:44-45,72-84 parity) with no external lib."""

from __future__ import annotations

import pytest

from lichess_event_stream_watcher_spark.functions.mmdb import (
    MmdbReader,
    geoip_city_record,
    mmdb_to_range_df,
    mmdb_to_range_rows,
)

# -- a tiny spec-conformant encoder (test-only) -----------------------------


def enc_str(s: str) -> bytes:
    b = s.encode()
    assert len(b) < 29
    return bytes([(2 << 5) | len(b)]) + b


def enc_uint(v: int, type_: int = 6) -> bytes:
    bs = v.to_bytes((v.bit_length() + 7) // 8, "big") if v else b""
    return bytes([(type_ << 5) | len(bs)]) + bs


def enc_map(items: list[tuple[str, bytes]]) -> bytes:
    out = bytes([(7 << 5) | len(items)])
    for k, v in items:
        out += enc_str(k) + v
    return out


def enc_array(items: list[bytes]) -> bytes:
    # extended type: ctrl type bits 0, then next byte = type - 7 = 4
    out = bytes([(0 << 5) | len(items), 11 - 7])
    for v in items:
        out += v
    return out


def city_record(country: str, city: str | None = None, subs: list[str] | None = None) -> bytes:
    items = [("country", enc_map([("names", enc_map([("en", enc_str(country))]))]))]
    if city is not None:
        items.append(("city", enc_map([("names", enc_map([("en", enc_str(city))]))])))
    if subs:
        items.append(
            (
                "subdivisions",
                enc_array([enc_map([("names", enc_map([("en", enc_str(s))]))]) for s in subs]),
            )
        )
    return enc_map(sorted(items))


class _Trie:
    def __init__(self):
        self.children: list[int | None | tuple] = [None, None]  # node idx | ("data", off)


def build_mmdb(networks: list[tuple[str, int, bytes]], ip_version: int = 4) -> bytes:
    """networks: (dotted_quad_prefix, prefix_len, encoded_record)."""
    data_section = b""
    offsets = []
    for _, _, rec in networks:
        offsets.append(len(data_section))
        data_section += rec

    nodes: list[_Trie] = [_Trie()]
    depth_prefix = 96 if ip_version == 6 else 0
    for (quad, plen, _), off in zip(networks, offsets):
        ipn = 0
        for part in quad.split("."):
            ipn = (ipn << 8) | int(part)
        bits = [(ipn >> (31 - i)) & 1 for i in range(plen)]
        bits = [0] * depth_prefix + bits
        cur = 0
        for b in bits[:-1]:
            nxt = nodes[cur].children[b]
            if not isinstance(nxt, int):
                nodes.append(_Trie())
                nxt = len(nodes) - 1
                nodes[cur].children[b] = nxt
            cur = nxt
        nodes[cur].children[bits[-1]] = ("data", off)

    node_count = len(nodes)

    def record(v) -> int:
        if v is None:
            return node_count
        if isinstance(v, int):
            return v
        return node_count + 16 + v[1]

    tree = b""
    for n in nodes:  # record_size 32: two 4-byte records per node
        tree += record(n.children[0]).to_bytes(4, "big")
        tree += record(n.children[1]).to_bytes(4, "big")

    metadata = enc_map(
        [
            ("binary_format_major_version", enc_uint(2, 5)),
            ("binary_format_minor_version", enc_uint(0, 5)),
            ("database_type", enc_str("GeoLite2-City")),
            ("ip_version", enc_uint(ip_version, 5)),
            ("node_count", enc_uint(node_count)),
            ("record_size", enc_uint(32, 5)),
        ]
    )
    return tree + b"\x00" * 16 + data_section + b"\xab\xcd\xefMaxMind.com" + metadata


NETWORKS = [
    ("1.0.0.0", 8, city_record("Testland", "Testville", ["TS", "T2"])),
    ("2.2.0.0", 16, city_record("Otherland")),
]


@pytest.fixture()
def mmdb_path(tmp_path):
    p = tmp_path / "tiny.mmdb"
    p.write_bytes(build_mmdb(NETWORKS))
    return str(p)


def test_reader_metadata_and_networks(mmdb_path):
    r = MmdbReader.open(mmdb_path)
    assert r.ip_version == 4 and r.record_size == 32
    nets = sorted(r.ipv4_networks())
    assert [(lo, hi) for lo, hi, _ in nets] == [
        (1 << 24, (2 << 24) - 1),          # 1.0.0.0/8
        ((2 << 24) + (2 << 16), (2 << 24) + (3 << 16) - 1),  # 2.2.0.0/16
    ]
    assert geoip_city_record(nets[0][2]) == ("Testland", "Testville", ["TS", "T2"])
    assert geoip_city_record(nets[1][2]) == ("Otherland", None, [])


def test_ipv6_tree_ipv4_subtree(tmp_path):
    """GeoLite2 ships ip_version=6 with IPv4 at ::/96 — the converter must
    descend the 96 left edges and find the same networks."""
    p = tmp_path / "v6.mmdb"
    p.write_bytes(build_mmdb(NETWORKS, ip_version=6))
    rows = mmdb_to_range_rows(str(p))
    assert [(r[0], r[2]) for r in rows] == [(1 << 24, "Testland"), ((2 << 24) + (2 << 16), "Otherland")]


def test_range_df_drives_banded_enrichment(spark, mmdb_path):
    """The converted dim plugs straight into enrich_geoip_banded: an event
    IP inside 1.0.0.0/8 picks up the GeoLite2 names, one outside stays
    NULL (src/eventhandler.rs:72-84 lookup semantics)."""
    from lichess_event_stream_watcher_spark.operators.enrich import enrich_geoip_banded

    dim = mmdb_to_range_df(spark, mmdb_path)
    events = spark.createDataFrame(
        [("A", "1.2.3.4"), ("B", "2.2.9.9"), ("C", "9.9.9.9")], "username string, ip string"
    )
    out = {r["username"]: r["geoip"] for r in enrich_geoip_banded(events, dim).collect()}
    assert out["A"]["country"] == "Testland" and out["A"]["city"] == "Testville"
    assert out["A"]["subdivisions"] == ["TS", "T2"]
    assert out["B"]["country"] == "Otherland" and out["B"]["city"] is None
    assert out["C"] is None


def test_point_lookup_udf_matches_range_join(spark, mmdb_path):
    """The faithful per-row UDF (tree walk per IP) and the banded range
    join (converted dim) are two physical plans for the same lookup."""
    from lichess_event_stream_watcher_spark.operators.enrich import (
        enrich_geoip_banded,
        enrich_geoip_mmdb,
    )

    dim = mmdb_to_range_df(spark, mmdb_path)
    events = spark.createDataFrame(
        [("A", "1.2.3.4"), ("B", "2.2.9.9"), ("C", "9.9.9.9"), ("D", "not-an-ip")],
        "username string, ip string",
    )
    with open(mmdb_path, "rb") as f:
        blob = f.read()
    via_join = {r["username"]: r["geoip"] for r in enrich_geoip_banded(events, dim).collect()}
    via_udf = {r["username"]: r["geoip"] for r in enrich_geoip_mmdb(events, blob).collect()}
    assert via_udf == via_join
    assert via_udf["C"] is None and via_udf["D"] is None


def test_int32_zero_extends_truncated_encodings():
    """Spec: int32 is stored in 0-4 bytes ZERO-extended — reference
    readers right-justify to 4 bytes before the signed unpack, so a
    1-byte 0xFF decodes to 255, not -1; only a full-width value with
    bit 31 set is negative (round-7 review fix)."""
    r = MmdbReader.__new__(MmdbReader)
    r.data_start = 0
    # tagged int32: ctrl 0x01 (extended, size=1), ext byte 0x01 (7+1=8)
    r.buf = b"\x01\x01\xff"
    assert r._decode(0, base=0) == (255, 3)
    r.buf = b"\x02\x01\xff\xff"  # size=2
    assert r._decode(0, base=0) == (65535, 4)
    r.buf = b"\x04\x01\xff\xff\xff\xff"  # full 4 bytes, bit 31 set
    assert r._decode(0, base=0) == (-1, 6)
    r.buf = b"\x00\x01"  # size=0 -> value 0
    assert r._decode(0, base=0) == (0, 2)


def test_pointer_resolves_against_caller_base():
    """Pointers resolve relative to the CALLER'S base, not a hardcoded
    data_start (which is not even assigned yet during metadata decode) —
    round-7 review fix."""
    r = MmdbReader.__new__(MmdbReader)
    # buffer: [0]= pointer (psize=0, prefix=0, raw=0x02) -> base+2,
    #         [2]= uint16 value 7 (ctrl 0xA1 = type 5, size 1)
    r.buf = b"\x20\x02\xa1\x07"
    # no data_start attribute set: must still work with explicit base
    assert r._decode(0, base=0) == (7, 2)
    # shifted base: same encoded pointer lands on the shifted target
    r.buf = b"\x00" + b"\x20\x02" + b"\x00" + b"\xa1\x07"
    assert r._decode(1, base=2) == (7, 3)
