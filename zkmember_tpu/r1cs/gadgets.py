"""Gadget stdlib: field vars, booleans, TE point ops, Pedersen CRH, Merkle path.

Capability parity with `ark-r1cs-std` + the gadget half of
`ark-crypto-primitives` as exercised by the reference circuit (SURVEY.md
section 2.2 rows ark-r1cs-std / ark-crypto-primitives; use sites
/root/reference/src/commitments/pedersen381/constraint.rs:43-69 and the
PathVar::verify_membership call at :62-67).

Gadget semantics mirror the native hash exactly (hash.pedersen): the same
per-bit conditional TE additions against the same generator tables, so a
witness produced here hashes to the same digests the device kernels compute.

Cost model (per conditional constant-point add): 5 constraints —
1 for u = x*y, 2 division-form constraints for the complete TE addition,
2 for the boolean selects.
"""

from __future__ import annotations

from zkmember_tpu.r1cs.cs import LC, ConstraintSystem


def one_lc(cs: ConstraintSystem, c: int = 1) -> LC:
    return LC({0: c % cs.p})


class FpVar:
    """Field variable as (linear combination, assigned value).

    Additions/scalings are free (LC algebra); only products allocate.
    """

    __slots__ = ("cs", "lc", "value")

    def __init__(self, cs: ConstraintSystem, lc: LC, value: int):
        self.cs = cs
        self.lc = lc
        self.value = value % cs.p

    # -- constructors -------------------------------------------------------
    @classmethod
    def constant(cls, cs: ConstraintSystem, v: int) -> "FpVar":
        return cls(cs, one_lc(cs, v), v)

    @classmethod
    def new_input(cls, cs: ConstraintSystem, v: int) -> "FpVar":
        idx = cs.new_input(v)
        return cls(cs, LC({idx: 1}), v)

    @classmethod
    def new_witness(cls, cs: ConstraintSystem, v: int) -> "FpVar":
        idx = cs.new_witness(v)
        return cls(cs, LC({idx: 1}), v)

    # -- linear ops (free) ---------------------------------------------------
    def __add__(self, o: "FpVar") -> "FpVar":
        return FpVar(self.cs, self.lc.plus(o.lc, self.cs.p), self.value + o.value)

    def __sub__(self, o: "FpVar") -> "FpVar":
        return self + o.scaled(-1)

    def scaled(self, c: int) -> "FpVar":
        return FpVar(self.cs, self.lc.scaled(c, self.cs.p), self.value * c)

    def add_constant(self, c: int) -> "FpVar":
        return FpVar(self.cs, self.lc.plus(one_lc(self.cs, c), self.cs.p), self.value + c)

    # -- multiplicative ops (1 constraint) ------------------------------------
    def __mul__(self, o: "FpVar") -> "FpVar":
        cs = self.cs
        w = FpVar.new_witness(cs, self.value * o.value % cs.p)
        cs.enforce(self.lc, o.lc, w.lc, "mul")
        return w

    def enforce_equal(self, o: "FpVar", name: str = "eq"):
        # (a - b) * 1 = 0
        cs = self.cs
        cs.enforce((self - o).lc, one_lc(cs), LC(), name)

    def is_eq(self, o: "FpVar") -> "Boolean":
        """Allocate b = (self == o) with the standard inverse trick.

        Constraints: d = self - o; b*d = 0; (1-b) = d * inv_d_or_0.
        """
        cs = self.cs
        d = self - o
        is_equal = 1 if d.value % cs.p == 0 else 0
        b = Boolean.new_witness(cs, is_equal)
        inv = pow(d.value, -1, cs.p) if d.value % cs.p else 0
        inv_var = FpVar.new_witness(cs, inv)
        # b * d = 0  (if unequal, b must be 0)
        cs.enforce(b.var.lc, d.lc, LC(), "is_eq/zero")
        # d * inv = 1 - b  (if equal, d=0 forces b=1)
        cs.enforce(d.lc, inv_var.lc, one_lc(cs).plus(b.var.lc.scaled(-1, cs.p), cs.p), "is_eq/inv")
        return b


class Boolean:
    """Boolean variable: an FpVar constrained to {0, 1}."""

    __slots__ = ("var",)

    def __init__(self, var: FpVar):
        self.var = var

    @property
    def value(self) -> int:
        return self.var.value

    @classmethod
    def new_witness(cls, cs: ConstraintSystem, bit: int) -> "Boolean":
        v = FpVar.new_witness(cs, bit)
        # b * (1 - b) = 0
        cs.enforce(v.lc, one_lc(cs).plus(v.lc.scaled(-1, cs.p), cs.p), LC(), "bool")
        (idx,) = v.lc.keys()
        cs.mark_boolean(idx)
        return cls(v)

    @classmethod
    def constant(cls, cs: ConstraintSystem, bit: int) -> "Boolean":
        return cls(FpVar.constant(cs, bit))

    def enforce_true(self):
        self.var.enforce_equal(FpVar.constant(self.var.cs, 1), "enforce_true")

    def select(self, t: FpVar, f: FpVar) -> FpVar:
        """bit ? t : f  — one constraint: bit * (t - f) = out - f."""
        cs = self.var.cs
        out_val = t.value if self.value else f.value
        out = FpVar.new_witness(cs, out_val)
        cs.enforce(self.var.lc, (t - f).lc, (out - f).lc, "select")
        return out


def bits_to_fpvar_le(cs: ConstraintSystem, bits: list[Boolean]) -> FpVar:
    """Pack little-endian bits into a field var (linear, free)."""
    acc = FpVar.constant(cs, 0)
    for i, b in enumerate(bits):
        acc = acc + b.var.scaled(pow(2, i, cs.p))
    return acc


def fpvar_to_bits_le(v: FpVar, nbits: int) -> list[Boolean]:
    """Decompose into nbits little-endian booleans + one packing constraint.

    Non-unique packing (mod p), matching arkworks' to_non_unique_bits_le that
    underlies digest-to-bytes conversions inside hash gadgets.
    """
    cs = v.cs
    val = v.value % cs.p
    assert val < (1 << nbits), "value exceeds bit width"
    bits = [Boolean.new_witness(cs, (val >> i) & 1) for i in range(nbits)]
    packed = bits_to_fpvar_le(cs, bits)
    v.enforce_equal(packed, "pack")
    return bits


# ---------------------------------------------------------------------------
# twisted Edwards point gadget (affine coordinates) + Pedersen CRH gadget
# ---------------------------------------------------------------------------


class TEPointVar:
    """Affine TE point (x, y) as FpVars; curve params from the host curve."""

    __slots__ = ("curve", "x", "y")

    def __init__(self, curve, x: FpVar, y: FpVar):
        self.curve = curve
        self.x = x
        self.y = y

    @classmethod
    def identity(cls, cs: ConstraintSystem, curve) -> "TEPointVar":
        return cls(curve, FpVar.constant(cs, 0), FpVar.constant(cs, 1))

    def cond_add_constant(self, bit: Boolean, qx: int, qy: int) -> "TEPointVar":
        """self + (qx, qy) if bit else self — the Pedersen per-bit step.

        Complete TE addition in division form with constant second operand:
            u  = x * y                                   (1 constraint)
            x3 * (1 + d qx qy u) = x qy + y qx           (1 constraint)
            y3 * (1 - d qx qy u) = y qy - a x qx         (1 constraint)
            xo = bit ? x3 : x ; yo = bit ? y3 : y        (2 constraints)
        """
        cs = self.x.cs
        p = cs.p
        curve = self.curve
        a, d = curve.a.v, curve.d.v
        k = d * qx % p * qy % p

        u = self.x * self.y
        # witness the addition result (host formula = native hash formula)
        hx, hy = self.x.value, self.y.value
        den_x = (1 + k * u.value) % p
        den_y = (1 - k * u.value) % p
        x3_val = (hx * qy + hy * qx) % p * pow(den_x, -1, p) % p
        y3_val = (hy * qy - a * hx % p * qx) % p * pow(den_y, -1, p) % p
        x3 = FpVar.new_witness(cs, x3_val)
        y3 = FpVar.new_witness(cs, y3_val)
        one = one_lc(cs)
        # x3 * (1 + k u) = qy * x + qx * y
        cs.enforce(
            x3.lc,
            one.plus(u.lc.scaled(k, p), p),
            self.x.lc.scaled(qy, p).plus(self.y.lc.scaled(qx, p), p),
            "te_add/x",
        )
        # y3 * (1 - k u) = qy * y - a qx * x
        cs.enforce(
            y3.lc,
            one.plus(u.lc.scaled(-k, p), p),
            self.y.lc.scaled(qy, p).plus(self.x.lc.scaled(-a * qx, p), p),
            "te_add/y",
        )
        xo = bit.select(x3, self.x)
        yo = bit.select(y3, self.y)
        return TEPointVar(curve, xo, yo)


def pedersen_hash_gadget(cs: ConstraintSystem, params, bits: list[Boolean]) -> FpVar:
    """In-circuit Pedersen CRH + TECompressor: returns the digest x-coord var.

    `params`: hash.pedersen.PedersenParams — the SAME table the native hash
    uses; constant bits (circuit-time zeros from padding) cost nothing.
    """
    cap = params.window.capacity_bits
    assert len(bits) <= cap
    acc = TEPointVar.identity(cs, params.curve)
    for k, b in enumerate(bits):
        qx, qy = params.table_host[k][0].v, params.table_host[k][1].v
        if isinstance(b, int):  # trace-time constant bit
            if b:
                raise ValueError("constant one bits unsupported; pass Boolean")
            continue
        acc = acc.cond_add_constant(b, qx, qy)
    return acc.x  # TECompressor


def two_to_one_gadget(cs: ConstraintSystem, params, left: FpVar, right: FpVar) -> FpVar:
    """TwoToOne Pedersen gadget over digest vars (bit-decomposes both)."""
    half = params.window.capacity_bits // 2
    lb = fpvar_to_bits_le(left, half)
    rb = fpvar_to_bits_le(right, half)
    return pedersen_hash_gadget(cs, params, lb + rb)


def leaf_rehash_gadget(cs: ConstraintSystem, leaf_params, digest: FpVar, digest_bits: int) -> FpVar:
    """The tree-level leaf hash: LeafHash(bytes(digest)) in-circuit."""
    bits = fpvar_to_bits_le(digest, digest_bits)
    return pedersen_hash_gadget(cs, leaf_params, bits)


def merkle_path_gadget(
    cs: ConstraintSystem,
    leaf_params,
    node_params,
    root: FpVar,
    leaf_digest: FpVar,
    index_bits: list[Boolean],
    sibling_vars: list[FpVar],
) -> "Boolean":
    """PathVar::verify_membership semantics (constraint.rs:62-67).

    Recomputes the root from the public leaf digest and the private path
    (sibling digests + direction bits), returning an is-member Boolean.
    """
    spec_bits = node_params.window.capacity_bits // 2
    cur = leaf_rehash_gadget(cs, leaf_params, leaf_digest, spec_bits)
    for bit, sib in zip(index_bits, sibling_vars):
        left = bit.select(sib, cur)
        right = bit.select(cur, sib)
        cur = two_to_one_gadget(cs, node_params, left, right)
    return cur.is_eq(root)
