"""Property suite for the hand-written Avro binary encoder
(sparkclean/avro_ocf.py): hypothesis-generated records over a rich
schema must round-trip through our own writer/reader, and a
hypothesis-accumulated corpus must be accepted verbatim by the Java
reference implementation (avro-1.12 on Spark's classpath) — the same
two-reader discipline the Iceberg tests use, driven over generated
edge values (longs at the zigzag/varint boundaries, empty/unicode
strings, deep optional nesting, empty containers)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkclean.avro_ocf import read_ocf, write_ocf

SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "f", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "o", "type": ["null", "long"], "default": None},
        {"name": "os", "type": ["null", "string"], "default": None},
        {
            "name": "arr",
            "type": {"type": "array", "items": ["null", "long"]},
        },
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {
            "name": "rec",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [
                    {"name": "x", "type": "long"},
                    {"name": "nested", "type": ["null", {
                        "type": "record",
                        "name": "inner2",
                        "fields": [{"name": "y", "type": "string"}],
                    }], "default": None},
                ],
            },
        },
    ],
}

# longs at the varint/zigzag boundaries plus arbitrary 64-bit values
LONGS = st.one_of(
    st.sampled_from(
        [0, -1, 1, 63, 64, -64, -65, 127, 128, -(2**63), 2**63 - 1]
        + [2**k for k in (7, 14, 21, 28, 35, 42, 49, 56, 62)]
        + [-(2**k) for k in (7, 14, 21, 28, 35, 42, 49, 56, 62)]
    ),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
)
INTS = st.integers(min_value=-(2**31), max_value=2**31 - 1)
TEXTS = st.text(max_size=20)

RECORD = st.fixed_dictionaries(
    {
        "l": LONGS,
        "i": INTS,
        "s": TEXTS,
        "b": st.binary(max_size=16),
        "f": st.booleans(),
        "d": st.one_of(
            st.floats(allow_nan=False, allow_infinity=True), st.just(-0.0)
        ),
        "o": st.one_of(st.none(), LONGS),
        "os": st.one_of(st.none(), TEXTS),
        "arr": st.lists(st.one_of(st.none(), LONGS), max_size=6),
        "m": st.dictionaries(TEXTS, TEXTS, max_size=4),
        "rec": st.fixed_dictionaries(
            {
                "x": LONGS,
                "nested": st.one_of(
                    st.none(), st.fixed_dictionaries({"y": TEXTS})
                ),
            }
        ),
    }
)

_CORPUS: list[dict] = []


@given(st.lists(RECORD, min_size=0, max_size=5))
@settings(max_examples=150, deadline=None)
def test_ocf_python_roundtrip_property(records):
    p = "/tmp/sparkclean_avro_prop.avro"
    write_ocf(p, SCHEMA, records)
    schema, _, back = read_ocf(p)
    assert schema == SCHEMA
    assert back == records
    _CORPUS.extend(records[:2])


def test_ocf_java_reference_accepts_generated_corpus(spark, tmp_path):
    """One Java-reader pass over the hypothesis-accumulated corpus (plus
    fixed boundary rows in case the property test ran first with an
    empty cache) — every field of every record must match."""
    rows = _CORPUS[:200] or []
    rows.append(
        {
            "l": -(2**63), "i": 2**31 - 1, "s": "héllo ☃", "b": b"\x00\xff",
            "f": True, "d": float("inf"), "o": None, "os": "",
            "arr": [None, 1, -(2**62)], "m": {"": "v"},
            "rec": {"x": 2**63 - 1, "nested": {"y": "ø"}},
        }
    )
    p = str(tmp_path / "corpus.avro")
    write_ocf(p, SCHEMA, rows)
    jvm = spark._jvm
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        got.append(dfr.next())
    dfr.close()
    assert len(got) == len(rows)

    def unwrap(jv):
        # py4j returns Utf8/ByteBuffer/GenericData wrappers; compare
        # through their canonical python forms
        cls = jv.getClass().getName() if jv is not None and hasattr(jv, "getClass") else None
        if jv is None or isinstance(jv, (int, float, bool, str)):
            return jv
        if cls == "org.apache.avro.util.Utf8":
            return str(jv)
        if cls == "java.nio.HeapByteBuffer":
            n = jv.remaining()
            out = bytes(jv.get(i) % 256 for i in range(jv.position(), jv.position() + n))
            return out
        return jv

    for want, jrec in zip(rows, got):
        assert unwrap(jrec.get("l")) == want["l"]
        assert unwrap(jrec.get("i")) == want["i"]
        assert unwrap(jrec.get("s")) == want["s"]
        assert unwrap(jrec.get("b")) == want["b"]
        assert unwrap(jrec.get("f")) == want["f"]
        d = unwrap(jrec.get("d"))
        assert d == want["d"] or (repr(d) == repr(want["d"]))
        assert unwrap(jrec.get("o")) == want["o"]
        assert unwrap(jrec.get("os")) == want["os"]
        jarr = jrec.get("arr")
        assert [unwrap(x) for x in jarr] == want["arr"]
        jm = jrec.get("m")
        assert {str(k): unwrap(v) for k, v in dict(jm).items()} == want["m"]
        jr = jrec.get("rec")
        assert unwrap(jr.get("x")) == want["rec"]["x"]
        nested = jr.get("nested")
        if want["rec"]["nested"] is None:
            assert nested is None
        else:
            assert unwrap(nested.get("y")) == want["rec"]["nested"]["y"]
