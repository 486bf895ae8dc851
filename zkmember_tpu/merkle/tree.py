"""Binary Merkle tree over Pedersen digests — batched level-parallel build.

Capability parity with `ark-crypto-primitives`' `MerkleTree`/`Path` as the
reference uses them (/root/reference/src/commitments/pedersen381/common.rs:
76-110 tree construction, 199-208 host path verify; SURVEY.md section 3.4).

Reference semantics preserved:
  * tree leaves are arbitrary `ToBytes` values; the tree FIRST hashes each
    leaf with LeafHash (so the membership trees, whose app-level leaves are
    already member digests, hash those digests again — matching the
    reference's double-hash behavior);
  * internal node = TwoToOneHash(bytes(left_digest) || bytes(right_digest));
  * `Path` carries the sibling digests from leaf level upward plus the leaf
    index; verify recomputes to the root.

TPU design: each level of the tree is ONE batched two-to-one Pedersen hash
over all nodes at that level (the reference hashes node-by-node with rayon;
here the whole level rides a single scan of batched TE additions).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from zkmember_tpu.fields import device as dv
from zkmember_tpu.hash import pedersen as ph


@dataclass
class MerklePath:
    """Authentication path: sibling digests bottom-up + the leaf index."""

    leaf_index: int
    siblings: list  # host ints, leaf level first
    leaf_digest: int  # the tree-level leaf hash (LeafHash(bytes(app leaf)))


class MerkleTree:
    """Binary Merkle tree with power-of-two leaf count.

    leaf_params / node_params: PedersenParams for LeafHash / TwoToOneHash.
    leaves: list of byte strings (the app passes member digest bytes).
    """

    def __init__(
        self,
        leaf_params: ph.PedersenParams,
        node_params: ph.PedersenParams,
        leaves,
        backend: str = "auto",
    ):
        assert len(leaves) >= 2 and (len(leaves) & (len(leaves) - 1)) == 0, (
            "leaf count must be a power of two >= 2 (pad first — see "
            "app.membership.clean_membership_list)"
        )
        self.leaf_params = leaf_params
        self.node_params = node_params
        self.spec = node_params.spec
        cap = leaf_params.window.capacity_bits
        if backend == "auto":
            # small trees are pure dispatch/compile latency on device; the
            # host bignum hash builds a 16-member tree in < 1 s
            backend = "host" if len(leaves) <= 64 else "device"

        if backend == "host":
            nbytes = self.spec.n * dv.LIMB_BITS // 8
            cur = [ph.hash_bytes_host(leaf_params, b).v for b in leaves]
            self.levels = [dv.ints_to_limbs(cur, self.spec.n)]
            while len(cur) > 1:
                cur = [
                    ph.two_to_one_host(
                        node_params,
                        int(cur[i]).to_bytes(nbytes, "little"),
                        int(cur[i + 1]).to_bytes(nbytes, "little"),
                    ).v
                    for i in range(0, len(cur), 2)
                ]
                self.levels.append(dv.ints_to_limbs(cur, self.spec.n))
            return

        # level 0: hash leaf bytes (batched, tiled: one compiled program per
        # params regardless of level width)
        bits = np.stack([ph.bytes_to_bits(b, cap) for b in leaves])
        digests = ph.hash_bits_tiled(leaf_params, bits)
        self.levels = [digests]  # canonical numpy limb arrays, (width, n)
        while self.levels[-1].shape[0] > 1:
            cur = self.levels[-1]
            nxt = ph.two_to_one_tiled(node_params, cur[0::2], cur[1::2])
            self.levels.append(nxt)

    @property
    def depth(self) -> int:
        return len(self.levels) - 1

    def root(self) -> int:
        return dv.limbs_to_ints(np.asarray(self.levels[-1]))[0]

    def leaf_digest(self, i: int) -> int:
        return dv.limbs_to_ints(np.asarray(self.levels[0][i : i + 1]))[0]

    def generate_proof(self, i: int) -> MerklePath:
        sibs = []
        idx = i
        for level in self.levels[:-1]:
            sibs.append(dv.limbs_to_ints(np.asarray(level[idx ^ 1 : (idx ^ 1) + 1]))[0])
            idx >>= 1
        return MerklePath(leaf_index=i, siblings=sibs, leaf_digest=self.leaf_digest(i))


def path_verify_host(
    leaf_params: ph.PedersenParams,
    node_params: ph.PedersenParams,
    root: int,
    leaf_bytes: bytes,
    path: MerklePath,
) -> bool:
    """Host path verification (the reference's Path::verify, SURVEY.md 3.4)."""
    spec = node_params.spec
    nbytes = spec.n * dv.LIMB_BITS // 8
    cur = ph.hash_bytes_host(leaf_params, leaf_bytes).v
    idx = path.leaf_index
    for sib in path.siblings:
        l, r = (sib, cur) if idx & 1 else (cur, sib)
        cur = ph.two_to_one_host(
            node_params,
            int(l).to_bytes(nbytes, "little"),
            int(r).to_bytes(nbytes, "little"),
        ).v
        idx >>= 1
    return cur == root
