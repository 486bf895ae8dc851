"""R1CS constraint system: allocation, linear combinations, diagnostics.

Capability parity with `ark-relations`' ConstraintSystem as the reference
exercises it (SURVEY.md section 2.2 row `ark-relations`; use sites
/root/reference/src/commitments/pedersen381/constraint.rs:37-71 allocation,
141-153 is_satisfied / which_is_unsatisfied diagnostics).

Design: gadget programs trace on the host into sparse A/B/C rows (each row a
small {var: coeff} dict) while eagerly computing the witness assignment —
variables always carry values, like arkworks' assigned mode.  The matrices
export to padded device-friendly CSR for the TPU prover (snark.groth16),
and the assignment exports as a limb-plane vector.

Variable indexing matches the Groth16 convention: z = (1, x_1..x_k, w_1..).
Instance variables must be allocated before witness variables (enforced).
"""

from __future__ import annotations

import numpy as np


class LC(dict):
    """Linear combination {var_index: int coeff mod p}.  Immutable by habit."""

    __slots__ = ()

    def scaled(self, c: int, p: int) -> "LC":
        if c % p == 0:
            return LC()
        return LC({k: (v * c) % p for k, v in self.items()})

    def plus(self, other: "LC", p: int) -> "LC":
        out = LC(self)
        for k, v in other.items():
            nv = (out.get(k, 0) + v) % p
            if nv:
                out[k] = nv
            else:
                out.pop(k, None)
        return out


class ConstraintSystem:
    """Sparse R1CS over a host prime field class (fields.host.FpElement)."""

    def __init__(self, field):
        self.field = field
        self.p = field.p
        self.values: list[int] = [1]  # z[0] = ONE
        self.num_instance = 1  # includes ONE
        self.witness_started = False
        self.A: list[LC] = []
        self.B: list[LC] = []
        self.C: list[LC] = []
        self.names: list[str] = []
        # variable indices constrained to {0,1} by gadget structure: the
        # static class map the prover's MSM layer uses to route boolean
        # witness scalars off the windowed path (msm.straus)
        self.boolean_vars: set[int] = set()

    def mark_boolean(self, idx: int):
        self.boolean_vars.add(idx)

    # -- allocation ----------------------------------------------------------
    def new_input(self, value: int) -> int:
        assert not self.witness_started, "allocate all instances before witnesses"
        self.values.append(value % self.p)
        self.num_instance += 1
        return len(self.values) - 1

    def new_witness(self, value: int) -> int:
        self.witness_started = True
        self.values.append(value % self.p)
        return len(self.values) - 1

    @property
    def num_variables(self) -> int:
        return len(self.values)

    @property
    def num_witness(self) -> int:
        return len(self.values) - self.num_instance

    @property
    def num_constraints(self) -> int:
        return len(self.A)

    # -- constraints ----------------------------------------------------------
    def enforce(self, a: LC, b: LC, c: LC, name: str = ""):
        """Add constraint <a, z> * <b, z> = <c, z>."""
        self.A.append(a)
        self.B.append(b)
        self.C.append(c)
        self.names.append(name)

    def lc_value(self, lc: LC) -> int:
        return sum(coeff * self.values[v] for v, coeff in lc.items()) % self.p

    # -- diagnostics (constraint.rs:141-153 parity) ---------------------------
    def is_satisfied(self) -> bool:
        return self.which_is_unsatisfied() is None

    def which_is_unsatisfied(self):
        """Index+name of the first violated constraint, or None."""
        for i, (a, b, c) in enumerate(zip(self.A, self.B, self.C)):
            if self.lc_value(a) * self.lc_value(b) % self.p != self.lc_value(c):
                return i, self.names[i]
        return None

    # -- export for the device prover -----------------------------------------
    def to_sparse(self):
        """Each matrix as (row_ptr, col_idx, coeffs) numpy CSR over ints."""

        def csr(rows):
            indptr = np.zeros(len(rows) + 1, np.int64)
            cols, vals = [], []
            for i, lc in enumerate(rows):
                items = sorted(lc.items())
                cols.extend(k for k, _ in items)
                vals.extend(v for _, v in items)
                indptr[i + 1] = len(cols)
            return indptr, np.array(cols, np.int64), vals  # vals: python ints

        return csr(self.A), csr(self.B), csr(self.C)
