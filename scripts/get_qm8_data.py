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


def mol_to_graph(mol, label: np.ndarray) -> dict:
    """RDKit Mol → graph dict. Atom type ids are atomic numbers mapped
    densely (H,C,N,O,F → 1..5 for QM8), labels the 16 QM8 targets."""
    z_map = {1: 1, 6: 2, 7: 3, 8: 4, 9: 5}
    atoms = np.asarray(
        [z_map.get(a.GetAtomicNum(), 6) for a in mol.GetAtoms()], np.int32
    )
    n = len(atoms)
    adj = np.zeros((len(BOND_TYPES), n, n), np.float32)
    for b in mol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        e = BOND_TYPES.index(str(b.GetBondType())) if str(
            b.GetBondType()
        ) in BOND_TYPES else 0
        adj[e, i, j] = adj[e, j, i] = 1.0
    return {"atom_type": atoms, "adj": adj, "label": label.astype(np.float32)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/qm8")
    ap.add_argument("--n-max", type=int, default=32)
    ap.add_argument("--num-eig-vec", type=int, default=20)
    ap.add_argument("--seed", type=int, default=1234)
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
            mol_to_graph(mol, y)
            for mol, y in zip(split.X, split.y)
            if mol.GetNumAtoms() <= args.n_max
        ]
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
