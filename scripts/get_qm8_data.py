#!/usr/bin/env python
"""QM8 ingest — the counterpart of the reference's one-off
download/preprocess script (SURVEY.md §3.5, `dataset/get_qm8_data.*`).

Pipeline (runs once, on a machine WITH network + deepchem/rdkit, which
this TPU box does not have — hence the gating):

    deepchem MoleculeNet QM8 (sdf + csv)
      → per molecule: atom types, per-bond-type dense adjacency, 16
        regression targets   (our graph-dict schema, data/qm8.py)
      → deterministic train/val/test split
      → pack_dataset(...) per split (operator stacks, Ritz pairs,
        label standardization)  → three .npz files

Point `dataset.source: packed` + `{train,val,test}_path` at the
outputs. If you instead have the reference's own pickled splits, skip
this script and use `dataset.source: reference_pickle`.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

BOND_TYPES = ("SINGLE", "DOUBLE", "TRIPLE", "AROMATIC")


def mol_to_graph(mol, label: np.ndarray, strict: bool = True) -> dict:
    """RDKit Mol → graph dict. Atom type ids are atomic numbers mapped
    densely (H,C,N,O,F → 1..5 for QM8), labels the 16 QM8 targets.

    Unknown chemistry is an error by default: silently aliasing an
    unexpected bond type to SINGLE or an unexpected element to a shared
    spare id would mis-encode the packed dataset used for all training.
    Pass ``strict=False`` to alias instead (aliases are counted by the
    caller and reported).
    """
    z_map = {1: 1, 6: 2, 7: 3, 8: 4, 9: 5}
    zs = [a.GetAtomicNum() for a in mol.GetAtoms()]
    unknown_z = sorted({z for z in zs if z not in z_map})
    if unknown_z and strict:
        raise ValueError(
            f"unexpected atomic numbers {unknown_z} (expected H/C/N/O/F); "
            "rerun with --allow-unknown to alias them to a spare id"
        )
    atoms = np.asarray([z_map.get(z, 6) for z in zs], np.int32)
    n = len(atoms)
    adj = np.zeros((len(BOND_TYPES), n, n), np.float32)
    unknown_bonds = []
    for b in mol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        bt = str(b.GetBondType())
        if bt in BOND_TYPES:
            e = BOND_TYPES.index(bt)
        elif strict:
            raise ValueError(
                f"unexpected bond type {bt!r} (expected {BOND_TYPES}); "
                "rerun with --allow-unknown to alias it to SINGLE"
            )
        else:
            unknown_bonds.append(bt)
            e = 0
        adj[e, i, j] = adj[e, j, i] = 1.0
    g = {"atom_type": atoms, "adj": adj, "label": label.astype(np.float32)}
    if unknown_z or unknown_bonds:
        g["_aliased"] = {"atoms": unknown_z, "bonds": unknown_bonds}
    return g


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/qm8")
    ap.add_argument("--n-max", type=int, default=32)
    ap.add_argument("--num-eig-vec", type=int, default=20)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument(
        "--allow-unknown",
        action="store_true",
        help="alias unknown bond types to SINGLE / unknown elements to a "
        "spare id (counted + reported) instead of raising",
    )
    args = ap.parse_args()

    try:
        import deepchem as dc  # noqa: F401
        from rdkit import Chem  # noqa: F401
    except ImportError as e:
        raise SystemExit(
            f"deepchem/rdkit unavailable ({e}); run this on a machine with "
            "network access, or use dataset.source: synthetic | "
            "reference_pickle instead"
        )

    tasks, (train, valid, test), _ = dc.molnet.load_qm8(
        featurizer="Raw", splitter="random", reload=False
    )
    from lanczosnet_tpu.data.dataset import pack_dataset, save_packed

    out = Path(args.out)
    stats = None
    for name, split in (("train", train), ("val", valid), ("test", test)):
        graphs = [
            mol_to_graph(mol, y, strict=not args.allow_unknown)
            for mol, y in zip(split.X, split.y)
            if mol.GetNumAtoms() <= args.n_max
        ]
        aliased = [g.pop("_aliased") for g in graphs if "_aliased" in g]
        if aliased:
            print(
                f"WARNING {name}: {len(aliased)} molecules had unknown "
                f"chemistry aliased (first: {aliased[0]})"
            )
        ds = pack_dataset(
            graphs,
            n_max=args.n_max,
            num_eig_vec=args.num_eig_vec,
            stats=stats,
            standardize=True,
        )
        stats = ds.stats or stats
        save_packed(ds, out / f"{name}.npz")
        print(f"{name}: {len(graphs)} molecules → {out}/{name}.npz")


if __name__ == "__main__":
    main()
