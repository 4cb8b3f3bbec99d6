"""Published ClickHouse doc-example contracts, sweep 6: the round-6
surface-tail batch 2 — URL hierarchy/parameter functions, IPv6 textual
forms, base58, HTML entities, geohash decode, morton curves, intHash
bit parity, bitPositionsToArray, SHA digests, tuple math/hamming,
arrayCumSumNonNegative, arrayLastIndex, countDigits — plus the map and
vector-math families the earlier sweeps never probed.
"""
from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.plans import execute_sql


def test_ch_doc_contracts_sweep6(spark):
    FAIL = []

    def probe(sql, expected, label, tables=None, approx=None):
        try:
            rows = execute_sql(spark, sql, tables or {}).collect()
            got = tuple(rows[0]) if len(rows) == 1 else [tuple(r) for r in rows]
            if len(rows) == 1 and len(rows[0]) == 1:
                got = rows[0][0]
            if approx is not None:
                if abs(got - expected) > approx:
                    FAIL.append(f"{label}: expected ~{expected!r} got {got!r}")
            elif got != expected:
                FAIL.append(f"{label}: expected {expected!r} got {got!r}")
        except Exception as e:
            FAIL.append(f"{label}: {type(e).__name__}: {str(e)[:90]}")

    # --- URL functions (docs: functions/url-functions) ---------------
    probe("SELECT URLHierarchy('https://example.com/browse/CONFERENCES/Business/')",
          ["https://example.com/", "https://example.com/browse/",
           "https://example.com/browse/CONFERENCES/",
           "https://example.com/browse/CONFERENCES/Business/"],
          "URLHierarchy")
    probe("SELECT URLPathHierarchy('https://example.com/browse/CONFERENCES/Business/')",
          ["/browse/", "/browse/CONFERENCES/", "/browse/CONFERENCES/Business/"],
          "URLPathHierarchy")
    probe("SELECT URLHierarchy('http://example.com/a?b=c')",
          ["http://example.com/", "http://example.com/a",
           "http://example.com/a?", "http://example.com/a?b=c"],
          "URLHierarchy query cut")
    probe("SELECT extractURLParameters('http://example.com/?page=1&lr=213')",
          ["page=1", "lr=213"], "extractURLParameters")
    probe("SELECT extractURLParameterNames('http://example.com/?page=1&lr=213')",
          ["page", "lr"], "extractURLParameterNames")
    probe("SELECT cutWWW('http://www.example.com/path')",
          "http://example.com/path", "cutWWW")
    probe("SELECT cutWWW('http://example.com/www.keep')",
          "http://example.com/www.keep", "cutWWW only domain prefix")

    # --- IPv6 / IPv4-mapped textual forms -----------------------------
    probe("SELECT IPv6NumToString(IPv6StringToNum('2a02:6b8::11'))",
          "2a02:6b8::11", "IPv6 round-trip")
    probe("SELECT IPv6NumToString(IPv4ToIPv6(IPv4StringToNum('192.168.0.1')))",
          "::ffff:192.168.0.1", "IPv4ToIPv6 mapped form")
    probe("SELECT IPv6NumToString(IPv6StringToNum('127.0.0.1'))",
          "::ffff:127.0.0.1", "IPv6StringToNum accepts IPv4")

    # --- base58 (Bitcoin alphabet; 'Hello World!' is the canonical
    # public test vector) ----------------------------------------------
    probe("SELECT base58Encode('Hello World!')", "2NEpo7TZRRrLZSi2U",
          "base58Encode")
    probe("SELECT base58Decode('2NEpo7TZRRrLZSi2U')", "Hello World!",
          "base58Decode")
    probe("SELECT base58Encode('')", "", "base58 empty")

    # --- HTML entities -------------------------------------------------
    probe("SELECT decodeHTMLComponent('&lt;p&gt;I&#39;m&amp;co&lt;/p&gt;')",
          "<p>I'm&co</p>", "decodeHTMLComponent named+numeric")

    # --- geohash decode (docs: geohashDecode('ezs42')) -----------------
    probe("SELECT tupleElement(geohashDecode('ezs42'), 1)",
          -5.60302734375, "geohashDecode lon")
    probe("SELECT tupleElement(geohashDecode('ezs42'), 2)",
          42.60498046875, "geohashDecode lat")
    probe("SELECT geohashDecode(geohashEncode(-5.60302734375, 42.60498046875, 5)) = geohashDecode('ezs42')",
          True, "geohash encode/decode round-trip")

    # --- morton curves (docs: mortonEncode(1,2,3) = 53) ----------------
    probe("SELECT mortonEncode(1, 2, 3)", 53, "mortonEncode")
    probe("SELECT mortonDecode(3, 53)", (1, 2, 3), "mortonDecode")
    probe("SELECT mortonEncode(1, 1)", 3, "mortonEncode 2d")

    # --- intHash bit parity (reference Common/HashTable/Hash.h); the
    # expected values replicate the published mix independently ---------
    def ih64(x):
        m = (1 << 64) - 1
        x &= m
        x ^= x >> 33
        x = (x * 0xff51afd7ed558ccd) & m
        x ^= x >> 33
        x = (x * 0xc4ceb9fe1a85ec53) & m
        x ^= x >> 33
        return x - (1 << 64) if x >= (1 << 63) else x

    def ih32(x):
        m = (1 << 64) - 1
        k = x & m
        k = ((~k & m) + ((k << 18) & m)) & m
        k ^= ((k >> 31) | (k << 33)) & m
        k = (k * 21) & m
        k ^= ((k >> 11) | (k << 53)) & m
        k = (k + ((k << 6) & m)) & m
        k ^= ((k >> 22) | (k << 42)) & m
        return k & 0xFFFFFFFF

    for v in (0, 1, 42, 123456789, -7):
        probe(f"SELECT intHash64(toInt64({v}))", ih64(v), f"intHash64({v})")
        probe(f"SELECT intHash32(toInt64({v}))", ih32(v), f"intHash32({v})")

    # --- bit positions (docs: bitPositionsToArray(toInt8(1)) = [0]) ----
    probe("SELECT bitPositionsToArray(toInt8(1))", [0], "bitPositions 1")
    probe("SELECT bitPositionsToArray(toInt8(-1))", [0, 1, 2, 3, 4, 5, 6, 7],
          "bitPositions Int8 -1 is 8-bit")
    probe("SELECT bitPositionsToArray(10)", [1, 3], "bitPositions 10")
    probe("SELECT bitPositionsToArray(0)", [], "bitPositions 0 empty")

    # --- SHA digests (FIPS-180 published vectors; CH hex is uppercase) -
    probe("SELECT hex(SHA1('abc'))",
          "A9993E364706816ABA3E25717850C26C9CD0D89D", "SHA1 abc")
    probe("SELECT hex(SHA256('abc'))",
          "BA7816BF8F01CFEA414140DE5DAE2223B00361A396177A9CB410FF61F20015AD",
          "SHA256 abc")
    probe("SELECT hex(SHA224('abc'))",
          "23097D223405D8228642A477BDA255B32AADBCE4BDA0B3F7E36C9DA7",
          "SHA224 abc")

    # --- tuple math / hamming (docs: tuple-functions) ------------------
    probe("SELECT tuplePlus((1, 2), (2, 3))", (3, 5), "tuplePlus")
    probe("SELECT tupleMinus((1, 2), (2, 3))", (-1, -1), "tupleMinus")
    probe("SELECT tupleHammingDistance((1, 2, 3), (3, 2, 1))", 2,
          "tupleHammingDistance")
    probe("SELECT tupleNegate((1, 2))", (-1, -2), "tupleNegate")

    # --- arrays -------------------------------------------------------
    probe("SELECT arrayCumSumNonNegative([1, 1, -4, 1])",
          [1.0, 2.0, 0.0, 1.0], "arrayCumSumNonNegative")
    probe("SELECT arrayLastIndex(x -> x = 1, [1, 2, 1])", 3,
          "arrayLastIndex dup-safe")
    probe("SELECT arrayLastIndex(x -> x = 9, [1, 2, 1])", 0,
          "arrayLastIndex none -> 0")
    probe("SELECT arrayAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1])", 0.75,
          "arrayAUC")

    # --- map family (docs: tuple-map-functions) ------------------------
    probe("SELECT mapAdd(map(1, 1), map(1, 1))", {1: 2}, "mapAdd")
    probe("SELECT mapPopulateSeries([1, 2, 4], [11, 22, 44])",
          ([1, 2, 3, 4], [11, 22, 0, 44]), "mapPopulateSeries")

    # --- vector math (docs: distance-functions) ------------------------
    probe("SELECT L1Norm((1, 2))", 3, "L1Norm")
    probe("SELECT L2Norm((3.0, 4.0))", 5.0, "L2Norm")
    probe("SELECT LinfNorm((1, -2))", 2, "LinfNorm")
    probe("SELECT cosineDistance((1, 0), (0, 1))", 1.0, "cosineDistance")
    probe("SELECT dotProduct((1, 2), (2, 3))", 8, "dotProduct")
    probe("SELECT L2Distance((1, 2), (2, 3))", 1.4142135623730951,
          "L2Distance")

    # --- strings --------------------------------------------------------
    probe("SELECT positionUTF8('Motörhead', 'törh')", 3, "positionUTF8")
    probe("SELECT countDigits(125)", 3, "countDigits")
    probe("SELECT countDigits(0)", 1, "countDigits 0")
    probe("SELECT initcapUTF8('не тормозит')", "Не Тормозит", "initcapUTF8")

    assert not FAIL, "\n".join(FAIL)
