"""Canonical serialization: ark-serialize v0.3-compatible wire formats.

The bit-exactness contract of the reference (SURVEY.md section 2.2 row
ark-serialize; use sites /root/reference/src/main.rs:107-176,212-220):
  * field elements: little-endian canonical bytes, width = ceil(bits/8);
  * SW points, compressed: x as LE bytes with 2 flag bits in the TOP bits
    of the LAST byte — bit7 = y is "negative" (y > p-y), bit6 = infinity;
  * sequences: u64 little-endian length prefix.

(The formats follow the documented arkworks 0.3 conventions; byte-level
cross-validation against a running arkworks requires Rust, unavailable in
this environment — SURVEY.md section 7.3 item 2.)
"""

from __future__ import annotations

Y_NEGATIVE_FLAG = 1 << 7
INFINITY_FLAG = 1 << 6


def _field_bytes(modulus: int) -> int:
    return (modulus.bit_length() + 7) // 8


def field_to_bytes(v: int, modulus: int) -> bytes:
    return int(v % modulus).to_bytes(_field_bytes(modulus), "little")


def field_from_bytes(b: bytes, modulus: int) -> int:
    v = int.from_bytes(b, "little")
    if v >= modulus:
        raise ValueError("non-canonical field encoding")
    return v


def _coord_ints(x) -> list[int]:
    """Flatten a (possibly extension) coordinate into base-field ints."""
    if hasattr(x, "coeffs"):
        out = []
        for c in x.coeffs:
            out.extend(_coord_ints(c))
        return out
    return [x.v]


def _coord_nbytes(field) -> int:
    if hasattr(field, "base"):
        return field.degree * _coord_nbytes(field.base)
    return _field_bytes(field.p)


def _base_modulus(field) -> int:
    while hasattr(field, "base"):
        field = field.base
    return field.p


def _y_is_negative(y) -> bool:
    """Lexicographic sign over the coefficient vector, top coefficient first
    (matches ark's Ord on extension fields: compare c1, then c0)."""
    ints = _coord_ints(y)
    p = _base_modulus(type(y)) if not hasattr(y, "p") else y.p
    neg_ints = _coord_ints(-y)
    return ints[::-1] > neg_ints[::-1]


def sw_point_to_bytes(curve, pt) -> bytes:
    """Compressed SW affine point (None = infinity)."""
    nbytes = _coord_nbytes(curve.field)
    if pt is None:
        out = bytearray(nbytes)
        out[-1] |= INFINITY_FLAG
        return bytes(out)
    x, y = pt
    base_p = _base_modulus(curve.field)
    out = bytearray()
    for c in _coord_ints(x):
        out += field_to_bytes(c, base_p)
    if _y_is_negative(y):
        out[-1] |= Y_NEGATIVE_FLAG
    return bytes(out)


def sw_point_from_bytes(curve, data: bytes):
    nbytes = _coord_nbytes(curve.field)
    assert len(data) == nbytes
    buf = bytearray(data)
    flags = buf[-1] & 0xC0
    buf[-1] &= 0x3F
    if flags & INFINITY_FLAG:
        return None
    base_p = _base_modulus(curve.field)
    per = _field_bytes(base_p)
    coeffs = [field_from_bytes(bytes(buf[i * per : (i + 1) * per]), base_p)
              for i in range(nbytes // per)]
    x = _build_coord(curve.field, coeffs)
    pt = curve.lift_x(x) if not hasattr(curve.field, "base") else _lift_x_ext(curve, x)
    if pt is None:
        raise ValueError("x not on curve")
    x0, y = pt
    if _y_is_negative(y) != bool(flags & Y_NEGATIVE_FLAG):
        y = -y
    return (x0, y)


def _build_coord(field, coeffs: list[int]):
    if hasattr(field, "base"):
        per = len(coeffs) // field.degree
        return field(*[_build_coord(field.base, coeffs[i * per : (i + 1) * per])
                       for i in range(field.degree)])
    assert len(coeffs) == 1
    return field(coeffs[0])


def _lift_x_ext(curve, x):
    """lift_x for extension-field curves (uses the generic ext sqrt)."""
    rhs = x * x * x + curve.a * x + curve.b
    y = rhs.sqrt()
    if y is None:
        return None
    return (x, y)


# ---------------------------------------------------------------------------
# zcash/IETF compressed format (BLS12-381 only) — known-answer anchor
# ---------------------------------------------------------------------------
#
# The ark-serialize 0.3 format above has no published byte vectors we can
# check offline (no Rust in this environment), but the zcash format does:
# the canonical compressed generators are fixed constants of the IETF
# BLS signature suites.  Encoding the SAME points both ways pins down our
# generator/sign-convention constants against published data; the two
# formats differ only in endianness (LE vs BE), flag placement (last vs
# first byte), and the extra "is compressed" bit (zcash bit7).


def bls_point_to_bytes_zcash(curve, pt) -> bytes:
    """zcash-format compressed point (BE, flags in the FIRST byte:
    0x80 = compressed, 0x40 = infinity, 0x20 = lexicographically-larger y).
    """
    base_p = _base_modulus(curve.field)
    per = _field_bytes(base_p)
    ncoeff = _coord_nbytes(curve.field) // per
    if pt is None:
        out = bytearray(ncoeff * per)
        out[0] = 0x80 | 0x40
        return bytes(out)
    x, y = pt
    coeffs = _coord_ints(x)[::-1]  # c1 first for Fq2 (zcash order)
    out = bytearray()
    for c in coeffs:
        out += int(c).to_bytes(per, "big")
    ys = _coord_ints(y)[::-1]  # compare c1, then c0
    larger = False
    for c in ys:
        if c:
            larger = c > (base_p - 1) // 2
            break
    out[0] |= 0x80 | (0x20 if larger else 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# proof / key containers (Groth16)
# ---------------------------------------------------------------------------


def _curves_for(proof_curve: str):
    from zkmember_tpu.snark.groth16 import pairing_config

    cfg = pairing_config(proof_curve)
    return cfg.mod.G1, cfg.mod.G2


def proof_to_bytes(proof) -> bytes:
    """Groth16 proof: a || b || c, compressed (192 bytes on BLS12-381)."""
    g1, g2 = _curves_for(proof.curve)
    return (
        sw_point_to_bytes(g1, proof.a)
        + sw_point_to_bytes(g2, proof.b)
        + sw_point_to_bytes(g1, proof.c)
    )


def proof_from_bytes(curve: str, data: bytes):
    from zkmember_tpu.snark.groth16 import Proof

    g1, g2 = _curves_for(curve)
    n1 = _coord_nbytes(g1.field)
    n2 = _coord_nbytes(g2.field)
    a = sw_point_from_bytes(g1, data[:n1])
    b = sw_point_from_bytes(g2, data[n1 : n1 + n2])
    c = sw_point_from_bytes(g1, data[n1 + n2 : n1 + n2 + n1])
    return Proof(curve=curve, a=a, b=b, c=c)


def vk_to_bytes(vk) -> bytes:
    g1, g2 = _curves_for(vk.curve)
    out = bytearray()
    out += sw_point_to_bytes(g1, vk.alpha_g1)
    out += sw_point_to_bytes(g2, vk.beta_g2)
    out += sw_point_to_bytes(g2, vk.gamma_g2)
    out += sw_point_to_bytes(g2, vk.delta_g2)
    out += len(vk.gamma_abc_g1).to_bytes(8, "little")
    for pt in vk.gamma_abc_g1:
        out += sw_point_to_bytes(g1, pt)
    return bytes(out)


def vk_from_bytes(curve: str, data: bytes):
    from zkmember_tpu.snark.groth16 import VerifyingKey

    g1, g2 = _curves_for(curve)
    n1, n2 = _coord_nbytes(g1.field), _coord_nbytes(g2.field)
    off = 0

    def take(n):
        nonlocal off
        chunk = data[off : off + n]
        off += n
        return chunk

    alpha = sw_point_from_bytes(g1, take(n1))
    beta = sw_point_from_bytes(g2, take(n2))
    gamma = sw_point_from_bytes(g2, take(n2))
    delta = sw_point_from_bytes(g2, take(n2))
    k = int.from_bytes(take(8), "little")
    abc = [sw_point_from_bytes(g1, take(n1)) for _ in range(k)]
    return VerifyingKey(
        curve=curve, alpha_g1=alpha, beta_g2=beta, gamma_g2=gamma,
        delta_g2=delta, gamma_abc_g1=abc,
    )
