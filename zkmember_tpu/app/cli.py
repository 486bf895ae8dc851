"""zkMember CLI: register members, generate and verify membership proofs.

The *working* version of the reference's deliberately-broken CLI
(/root/reference/src/main.rs:51-236 — feature-gated behind compile_error!,
SURVEY.md section 3.5): register -> rebuild tree -> print hex root;
prove -> Groth16 setup+prove+verify, print hex leaf/root/proof/vk;
verify -> parse hex root/leaf/proof/vk and run the pairing check.

Differences from the reference (deliberate): runtime --curve flag instead of
compile-time features; a JSON state file instead of in-memory-only members;
and an optional non-interactive subcommand surface so the loop is scriptable.

Usage:
  python -m zkmember_tpu.app.cli register --id 1 --email 1@usc.edu
  python -m zkmember_tpu.app.cli root
  python -m zkmember_tpu.app.cli prove --id 1
  python -m zkmember_tpu.app.cli verify --root <hex> --leaf <hex> \
      --proof <hex> --vk <hex>
  python -m zkmember_tpu.app.cli interactive
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from zkmember_tpu.app import circuits as app
from zkmember_tpu.app.member import Member
from zkmember_tpu.snark import groth16
from zkmember_tpu.utils import rng as frng
from zkmember_tpu.utils import serialize as ser

STATE_FILE = os.environ.get("ZKMEMBER_STATE", "zkmember_state.json")

BLUE, GREEN, GRAY, RESET = "\x1b[0;34m", "\x1b[0;32m", "\x1b[0;90m", "\x1b[0m"


def _load_state() -> list[Member]:
    if not os.path.exists(STATE_FILE):
        return []
    with open(STATE_FILE) as f:
        return [Member.from_json(json.dumps(m)) for m in json.load(f)]


def _save_state(members: list[Member]):
    with open(STATE_FILE, "w") as f:
        json.dump([json.loads(m.to_json()) for m in members], f, indent=1)


def _params(curve_stack: str):
    cfg = app.get_config(curve_stack)
    leaf_params, node_params = cfg.setup_params(frng.test_rng())
    return cfg, leaf_params, node_params


def _build_tree(cfg, leaf_params, node_params, members):
    digests = [m.hash(leaf_params) for m in members]
    tree = app.new_membership_tree(leaf_params, node_params, digests)
    return tree, digests


def cmd_register(args):
    members = _load_state()
    members.append(Member.new(args.id, args.email))
    _save_state(members)
    cfg, leaf_params, node_params = _params(args.stack)
    tree, _ = _build_tree(cfg, leaf_params, node_params, members)
    print(f"{BLUE}Number of Members: {len(members)}{RESET}")
    print(f"{GREEN}Merkle Root: {tree.root():#066x}{RESET}")


def cmd_root(args):
    members = _load_state()
    if not members:
        print("no members registered", file=sys.stderr)
        return 1
    cfg, leaf_params, node_params = _params(args.stack)
    tree, _ = _build_tree(cfg, leaf_params, node_params, members)
    print(f"{tree.root():#x}")


def cmd_prove(args):
    members = _load_state()
    idx = next((i for i, m in enumerate(members) if m.id == args.id), None)
    if idx is None:
        print(f"member id {args.id!r} not found", file=sys.stderr)
        return 1
    cfg, leaf_params, node_params = _params(args.stack)
    tree, digests = _build_tree(cfg, leaf_params, node_params, members)
    root = tree.root()
    path = tree.generate_proof(idx)
    circuit = app.MerkleTreeCircuit(
        config=cfg, leaf_params=leaf_params, node_params=node_params,
        root=root, leaf_hash=digests[idx], authentication_path=path,
    )
    cs = circuit.generate_constraints()
    curve = "bls12_381" if args.stack == "pedersen381" else "bw6_761"
    rng = frng.test_rng()
    pk, vk = groth16.setup(cs, curve=curve, rng=rng)
    proof = groth16.prove(pk, cs, rng=rng)
    ok = groth16.verify(vk, [root, digests[idx]], proof)
    print(f"{GRAY}Leaf:{RESET}  {digests[idx]:#x}")
    print(f"{GRAY}Root:{RESET}  {root:#x}")
    print(f"{GRAY}Proof:{RESET} {ser.proof_to_bytes(proof).hex()}")
    print(f"{GRAY}VK:{RESET}    {ser.vk_to_bytes(vk).hex()}")
    print(f"{GREEN}Inline verification: {ok}{RESET}")
    return 0 if ok else 1


def cmd_verify(args):
    curve = "bls12_381" if args.stack == "pedersen381" else "bw6_761"
    proof = ser.proof_from_bytes(curve, bytes.fromhex(args.proof))
    vk = ser.vk_from_bytes(curve, bytes.fromhex(args.vk))
    root = int(args.root, 16)
    leaf = int(args.leaf, 16)
    ok = groth16.verify(vk, [root, leaf], proof)
    print(f"{GREEN if ok else '\x1b[0;31m'}Verification: {ok}{RESET}")
    return 0 if ok else 1


def cmd_interactive(args):
    """The reference's dialoguer loop (main.rs:51-110), functional."""
    while True:
        print(f"{BLUE}zkMember — choose an action:{RESET}")
        print(" [1] register member\n [2] generate proof\n [3] verify proof\n [q] quit")
        choice = input("> ").strip()
        if choice == "1":
            mid = input("id> ").strip()
            email = input("email> ").strip()
            args.id, args.email = mid, email
            cmd_register(args)
        elif choice == "2":
            args.id = input("member id> ").strip()
            cmd_prove(args)
        elif choice == "3":
            args.root = input("root hex> ").strip()
            args.leaf = input("leaf hex> ").strip()
            args.proof = input("proof hex> ").strip()
            args.vk = input("vk hex> ").strip()
            cmd_verify(args)
        elif choice in ("q", "quit", "exit"):
            return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="zkmember")
    ap.add_argument("--stack", default="pedersen381",
                    choices=["pedersen381", "pedersen761"])
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("register")
    p.add_argument("--id", required=True)
    p.add_argument("--email", required=True)
    sub.add_parser("root")
    p = sub.add_parser("prove")
    p.add_argument("--id", required=True)
    p = sub.add_parser("verify")
    for f in ("root", "leaf", "proof", "vk"):
        p.add_argument(f"--{f}", required=True)
    sub.add_parser("interactive")
    args = ap.parse_args(argv)
    return {
        "register": cmd_register,
        "root": cmd_root,
        "prove": cmd_prove,
        "verify": cmd_verify,
        "interactive": cmd_interactive,
    }[args.cmd](args) or 0


if __name__ == "__main__":
    sys.exit(main())
