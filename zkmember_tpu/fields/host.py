"""Host-side (Python bignum) prime-field and tower-extension arithmetic.

This is the correctness anchor of the framework: the device (TPU) limb
kernels in ``zkmember_tpu.fields.mont`` are tested element-for-element
against these implementations, and host-only control paths (pairing-based
verification, serialization, parameter sampling) run on it directly.

Capability parity: replaces the `ark-ff` field stack the reference consumes
(see /root/reference usage at src/commitments/pedersen381/common.rs:17 and
SURVEY.md section 2.2 row 1), re-designed for a split host/device model:
Python ints on host, 16-bit-limb Montgomery planes on TPU.
"""

from __future__ import annotations

from functools import lru_cache


class FpElement:
    """An element of a prime field, value stored as a canonical Python int.

    Subclasses are generated per-modulus by :func:`prime_field` and carry the
    modulus as a class attribute, so instances are a single int slot.
    """

    __slots__ = ("v",)
    p: int = 0
    name: str = "Fp"

    def __init__(self, v: int = 0):
        self.v = v % self.p

    # -- constructors ------------------------------------------------------
    @classmethod
    def zero(cls):
        return cls(0)

    @classmethod
    def one(cls):
        return cls(1)

    @classmethod
    def from_int(cls, v: int):
        return cls(v)

    # -- predicates --------------------------------------------------------
    def is_zero(self) -> bool:
        return self.v == 0

    # -- arithmetic --------------------------------------------------------
    def __add__(self, o):
        return type(self)(self.v + o.v)

    def __sub__(self, o):
        return type(self)(self.v - o.v)

    def __neg__(self):
        return type(self)(-self.v)

    def __mul__(self, o):
        if isinstance(o, int):
            return type(self)(self.v * o)
        return type(self)(self.v * o.v)

    __rmul__ = __mul__

    def square(self):
        return type(self)(self.v * self.v)

    def double(self):
        return type(self)(self.v << 1)

    def inv(self):
        if self.v == 0:
            raise ZeroDivisionError(f"inverse of zero in {self.name}")
        return type(self)(pow(self.v, -1, self.p))

    def __truediv__(self, o):
        return self * o.inv()

    def __pow__(self, e: int):
        return type(self)(pow(self.v, e, self.p))

    # -- comparison / hashing ---------------------------------------------
    def __eq__(self, o):
        return isinstance(o, FpElement) and self.p == o.p and self.v == o.v

    def __hash__(self):
        return hash((self.p, self.v))

    def __repr__(self):
        return f"{self.name}({hex(self.v)})"

    # -- square roots ------------------------------------------------------
    def is_square(self) -> bool:
        return self.v == 0 or pow(self.v, (self.p - 1) // 2, self.p) == 1

    def sqrt(self):
        """Tonelli-Shanks square root; returns None when non-square.

        Result is normalized to the *smaller* of the two roots is NOT
        guaranteed; callers needing a canonical choice (point decompression)
        must select by parity/lexicographic order themselves.
        """
        p, a = self.p, self.v
        if a == 0:
            return type(self)(0)
        if pow(a, (p - 1) // 2, p) != 1:
            return None
        if p % 4 == 3:
            return type(self)(pow(a, (p + 1) // 4, p))
        # Tonelli-Shanks
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
        while t != 1:
            t2, i = t, 0
            while t2 != 1:
                t2 = t2 * t2 % p
                i += 1
            b = pow(c, 1 << (m - i - 1), p)
            m, c = i, b * b % p
            r = r * b % p
            t = t * c % p
        return type(self)(r)

    # -- serialization (ark-serialize compatible layout) -------------------
    def to_bytes_le(self, nbytes: int | None = None) -> bytes:
        """Little-endian canonical bytes (ark-serialize field layout)."""
        n = nbytes if nbytes is not None else (self.p.bit_length() + 7) // 8
        return self.v.to_bytes(n, "little")

    @classmethod
    def from_bytes_le(cls, b: bytes):
        v = int.from_bytes(b, "little")
        if v >= cls.p:
            raise ValueError(f"non-canonical {cls.name} encoding")
        return cls(v)


@lru_cache(maxsize=None)
def prime_field(p: int, name: str = "Fp") -> type[FpElement]:
    """Create (and cache) the field class for modulus ``p``."""
    return type(name, (FpElement,), {"p": p, "name": name, "__slots__": ()})


# ---------------------------------------------------------------------------
# Quadratic / cubic tower extensions (for pairings).
#
# The towers are generic over the base field and the non-residue so the same
# machinery instantiates BLS12-381's Fq2/Fq6/Fq12 and BW6-761's Fq6.
# ---------------------------------------------------------------------------


class ExtElement:
    """Element of an extension field; coefficients in ``coeffs`` (low->high).

    Subclasses define:
      base       -- coefficient field class
      degree     -- extension degree over base (2 or 3 here)
      nonresidue -- base-field element c with  x^degree = nonresidue
    """

    __slots__ = ("coeffs",)
    base: type = None
    degree: int = 0
    nonresidue = None
    name: str = "Ext"

    def __init__(self, *coeffs):
        if len(coeffs) == 1 and isinstance(coeffs[0], (list, tuple)):
            coeffs = tuple(coeffs[0])
        assert len(coeffs) == self.degree, (len(coeffs), self.degree)
        self.coeffs = tuple(coeffs)

    @classmethod
    def zero(cls):
        return cls(*[cls.base.zero() for _ in range(cls.degree)])

    @classmethod
    def one(cls):
        return cls(cls.base.one(), *[cls.base.zero() for _ in range(cls.degree - 1)])

    def is_zero(self):
        return all(c.is_zero() for c in self.coeffs)

    def __add__(self, o):
        return type(self)(*[a + b for a, b in zip(self.coeffs, o.coeffs)])

    def __sub__(self, o):
        return type(self)(*[a - b for a, b in zip(self.coeffs, o.coeffs)])

    def __neg__(self):
        return type(self)(*[-a for a in self.coeffs])

    def _mul_by_nonresidue(self, c):
        return c * self.nonresidue

    def __mul__(self, o):
        if isinstance(o, int):
            return type(self)(*[c * o for c in self.coeffs])
        if isinstance(o, FpElement) or (
            isinstance(o, ExtElement) and type(o) is not type(self)
        ):
            # scalar (sub-field) multiplication
            return type(self)(*[c * o for c in self.coeffs])
        d = self.degree
        a, b = self.coeffs, o.coeffs
        # schoolbook product, then reduce x^k for k >= d via x^d = nonresidue
        prod = [None] * (2 * d - 1)
        for i in range(d):
            for j in range(d):
                t = a[i] * b[j]
                prod[i + j] = t if prod[i + j] is None else prod[i + j] + t
        out = list(prod[:d])
        for k in range(d, 2 * d - 1):
            out[k - d] = out[k - d] + self._mul_by_nonresidue(prod[k])
        return type(self)(*out)

    __rmul__ = __mul__

    def square(self):
        return self * self

    def double(self):
        return type(self)(*[c.double() for c in self.coeffs])

    def inv(self):
        d = self.degree
        if d == 2:
            a0, a1 = self.coeffs
            # (a0 + a1 x)^-1 = (a0 - a1 x) / (a0^2 - nr * a1^2)
            norm = a0.square() - self._mul_by_nonresidue(a1.square())
            ninv = norm.inv()
            return type(self)(a0 * ninv, -(a1 * ninv))
        if d == 3:
            a0, a1, a2 = self.coeffs
            nr = lambda c: self._mul_by_nonresidue(c)  # noqa: E731
            t0 = a0.square() - nr(a1 * a2)
            t1 = nr(a2.square()) - a0 * a1
            t2 = a1.square() - a0 * a2
            norm = a0 * t0 + nr(a2 * t1) + nr(a1 * t2)
            ninv = norm.inv()
            return type(self)(t0 * ninv, t1 * ninv, t2 * ninv)
        raise NotImplementedError

    def __truediv__(self, o):
        return self * o.inv()

    def __pow__(self, e: int):
        if e < 0:
            return self.inv() ** (-e)
        result = type(self).one()
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base.square()
            e >>= 1
        return result

    def conjugate(self):
        """Degree-2 only: a0 - a1 x."""
        assert self.degree == 2
        a0, a1 = self.coeffs
        return type(self)(a0, -a1)

    # -- square roots (generic Tonelli-Shanks over the extension) -----------
    @classmethod
    def _group_order(cls) -> int:
        base_p = cls.base.p if hasattr(cls.base, "p") else cls.base._group_order() + 1
        return base_p**cls.degree - 1

    def is_square(self) -> bool:
        if self.is_zero():
            return True
        return (self ** (self._group_order() // 2)) == type(self).one()

    @classmethod
    @lru_cache(maxsize=None)
    def _nonresidue_for_sqrt(cls):
        """Find a quadratic non-residue by scanning small coefficient vectors."""
        half = cls._group_order() // 2
        one_b = cls.base.one()

        def small(k):  # k * 1 in the base field (works for nested towers)
            acc = cls.base.zero()
            for _ in range(k):
                acc = acc + one_b
            return acc

        n = 1
        while True:
            n += 1
            # digits of n in base 4 spread across coefficients
            digs, m = [], n
            for _ in range(cls.degree):
                digs.append(m % 4)
                m //= 4
            cand = cls(*[small(d) for d in digs])
            if not cand.is_zero() and (cand**half) != cls.one():
                return cand

    def sqrt(self):
        """Tonelli-Shanks in the multiplicative group; None if non-square."""
        if self.is_zero():
            return self
        cls = type(self)
        order = self._group_order()
        if (self ** (order // 2)) != cls.one():
            return None
        q, s = order, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        z = cls._nonresidue_for_sqrt()
        m, c, t, r = s, z**q, self**q, self ** ((q + 1) // 2)
        one = cls.one()
        while t != one:
            t2, i = t, 0
            while t2 != one:
                t2 = t2 * t2
                i += 1
            b = c ** (1 << (m - i - 1))
            m, c = i, b * b
            r = r * b
            t = t * c
        return r

    def __eq__(self, o):
        return (
            isinstance(o, ExtElement)
            and type(o) is type(self)
            and self.coeffs == o.coeffs
        )

    def __hash__(self):
        return hash((self.name, self.coeffs))

    def __repr__(self):
        return f"{self.name}{self.coeffs}"


def quadratic_extension(base, nonresidue, name):
    return type(
        name,
        (ExtElement,),
        {
            "base": base,
            "degree": 2,
            "nonresidue": nonresidue,
            "name": name,
            "__slots__": (),
        },
    )


def cubic_extension(base, nonresidue, name):
    return type(
        name,
        (ExtElement,),
        {
            "base": base,
            "degree": 3,
            "nonresidue": nonresidue,
            "name": name,
            "__slots__": (),
        },
    )
