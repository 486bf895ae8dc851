"""Deterministic RNG for parameter sampling, setup randomness, and tests.

Fills the role of `ark_std::test_rng()` in the reference (fixed-seed RNG
used for ALL setup and proving randomness — SURVEY.md section 2.2 row
`ark-std`; use sites /root/reference/src/commitments/pedersen381/mod.rs:21,
benches/groth16.rs:68).  The reference's exact rand-0.8 StdRng stream cannot
be reproduced without running Rust, so the framework defines its own
deterministic stream: python's Mersenne-like `random.Random` seeded with a
fixed constant.  Every sampling site in the framework draws from an explicit
rng object, so proofs/keys are reproducible run-to-run.
"""

from __future__ import annotations

import random

TEST_SEED = 0x5EED2000  # fixed framework-wide test seed


def test_rng(seed: int = TEST_SEED) -> random.Random:
    """Deterministic RNG — the framework analog of ark_std::test_rng()."""
    return random.Random(seed)


def secure_rng() -> random.Random:
    """OS-entropy RNG — the DEFAULT for proving randomness (Groth16 r/s,
    Marlin zk masks).  A deterministic default silently voided the hiding
    property: identical masks across proofs make commitments repeat
    (round-4 advisor finding).  Tests that need reproducible proofs pass
    test_rng() explicitly."""
    return random.SystemRandom()


def field_element(rng: random.Random, p: int) -> int:
    """Uniform element of Z_p."""
    return rng.randrange(p)


def nonzero_field_element(rng: random.Random, p: int) -> int:
    return rng.randrange(1, p)
