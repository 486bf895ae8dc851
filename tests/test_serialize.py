"""Serialization round-trips: field elements, compressed G1/G2 points."""

import random

import pytest

from zkmember_tpu.curves import bls12_381 as bls
from zkmember_tpu.curves import bw6_761 as bw6
from zkmember_tpu.utils import serialize as ser


def test_g1_point_roundtrip():
    rng = random.Random(31)
    for _ in range(4):
        pt = bls.G1.mul(rng.randrange(1, bls.R), bls.G1_GEN)
        b = ser.sw_point_to_bytes(bls.G1, pt)
        assert len(b) == 48
        assert ser.sw_point_from_bytes(bls.G1, b) == pt
    # infinity
    b = ser.sw_point_to_bytes(bls.G1, None)
    assert ser.sw_point_from_bytes(bls.G1, b) is None


def test_g2_point_roundtrip():
    rng = random.Random(32)
    pt = bls.G2.mul(rng.randrange(1, bls.R), bls.G2_GEN)
    b = ser.sw_point_to_bytes(bls.G2, pt)
    assert len(b) == 96
    assert ser.sw_point_from_bytes(bls.G2, b) == pt


def test_bw6_point_roundtrip():
    rng = random.Random(33)
    pt = bw6.G1.mul(rng.randrange(1, bw6.R), bw6.G1_GEN)
    b = ser.sw_point_to_bytes(bw6.G1, pt)
    assert len(b) == 96
    assert ser.sw_point_from_bytes(bw6.G1, b) == pt
    pt2 = bw6.G2.mul(rng.randrange(1, bw6.R), bw6.G2_GEN)
    b2 = ser.sw_point_to_bytes(bw6.G2, pt2)
    assert ser.sw_point_from_bytes(bw6.G2, b2) == pt2


def test_field_roundtrip():
    rng = random.Random(34)
    for p in (bls.R, bls.Q, bw6.Q):
        v = rng.randrange(p)
        assert ser.field_from_bytes(ser.field_to_bytes(v, p), p) == v
    with pytest.raises(ValueError):
        ser.field_from_bytes(ser.field_to_bytes(bls.R - 1, bls.R)[:-1] + b"\xff", bls.R)
