"""Execute scripts/get_qm8_data.py end-to-end against stub rdkit/deepchem.

The real ingest needs network + deepchem/rdkit (absent in this image),
so the script had never actually run (VERDICT r2, component #8). These
tests close the offline-actionable half of that gap: a fake `deepchem`
(molnet.load_qm8 returning rdkit-shaped Mol objects) and a fake `rdkit`
are placed on PYTHONPATH and the REAL script runs as a subprocess —
argument parsing, mol→graph conversion, strict-chemistry gating,
n_max filtering, per-split packing with shared train stats, npz layout.
The packed output is then trained for one epoch via the ordinary
`dataset.source: packed` runner path.

Reference counterpart: `[R] dataset/get_qm8_data.py` (SURVEY.md §3.5).
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "get_qm8_data.py")

# Fake deepchem: molnet.load_qm8 returns three splits of rdkit-shaped
# molecules (GetAtoms/GetBonds/GetNumAtoms with the exact accessor
# names the script consumes). Deterministic; FAKE_QM8_UNKNOWN=1 injects
# one molecule with Si (z=14) and a DATIVE bond into the train split to
# exercise the strict-chemistry gate.
STUB_DEEPCHEM = '''
import os

import numpy as np


class _Atom:
    def __init__(self, z):
        self._z = z

    def GetAtomicNum(self):
        return self._z


class _Bond:
    def __init__(self, i, j, bt):
        self._i, self._j, self._bt = i, j, bt

    def GetBeginAtomIdx(self):
        return self._i

    def GetEndAtomIdx(self):
        return self._j

    def GetBondType(self):
        return self._bt


class _Mol:
    def __init__(self, zs, bonds):
        self._atoms = [_Atom(z) for z in zs]
        self._bonds = [_Bond(i, j, bt) for i, j, bt in bonds]

    def GetAtoms(self):
        return self._atoms

    def GetBonds(self):
        return self._bonds

    def GetNumAtoms(self):
        return len(self._atoms)


class _Split:
    def __init__(self, mols, y):
        self.X, self.y = mols, y


def _mols(seed, n):
    rng = np.random.RandomState(seed)
    pool = [1, 6, 7, 8, 9]
    bts = ["SINGLE", "DOUBLE", "TRIPLE", "AROMATIC"]
    mols = []
    for _ in range(n):
        na = int(rng.randint(4, 12))
        zs = [6] + [int(pool[rng.randint(5)]) for _ in range(na - 1)]
        bonds = [(i, i + 1, bts[rng.randint(4)]) for i in range(na - 1)]
        if na > 4:
            bonds.append((0, na - 1, "SINGLE"))
        mols.append(_Mol(zs, bonds))
    return mols


class molnet:
    @staticmethod
    def load_qm8(featurizer=None, splitter=None, reload=None):
        rng = np.random.RandomState(0)
        splits = []
        for seed, n in ((1, 24), (2, 8), (3, 8)):
            mols = _mols(seed, n)
            if seed == 1:
                # oversized molecule: must be dropped by the n_max filter
                mols.append(_Mol([6] * 40, [(i, i + 1, "SINGLE") for i in range(39)]))
                if os.environ.get("FAKE_QM8_UNKNOWN"):
                    mols.append(_Mol([6, 14, 6], [(0, 1, "SINGLE"), (1, 2, "DATIVE")]))
            y = rng.randn(len(mols), 16)
            splits.append(_Split(mols, y))
        return ["t%d" % i for i in range(16)], tuple(splits), []
'''

STUB_RDKIT = "Chem = object()\n"


@pytest.fixture(scope="module")
def stub_path(tmp_path_factory):
    stubs = tmp_path_factory.mktemp("stubs")
    (stubs / "deepchem").mkdir()
    (stubs / "rdkit").mkdir()
    (stubs / "deepchem" / "__init__.py").write_text(STUB_DEEPCHEM)
    (stubs / "rdkit" / "__init__.py").write_text(STUB_RDKIT)
    return stubs


@pytest.fixture(scope="module")
def ingest_out(stub_path, tmp_path_factory):
    """One successful ingest run shared by the layout + training tests.

    Module-scoped: the subprocess pays ~15 s of cold jax import + pack
    work; running it once covers both consumers (the strict-gate test
    keeps its own runs because it exercises failure paths).
    """
    out_dir = tmp_path_factory.mktemp("qm8_packed") / "qm8"
    res = _run(stub_path, out_dir)
    assert res.returncode == 0, res.stdout + res.stderr
    return out_dir, res


def _run(stubs, out_dir, *extra, unknown=False):
    env = dict(
        os.environ,
        JAX_PLATFORM_NAME="cpu",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=f"{stubs}{os.pathsep}{REPO}",
    )
    env.pop("FAKE_QM8_UNKNOWN", None)
    if unknown:
        env["FAKE_QM8_UNKNOWN"] = "1"
    return subprocess.run(
        [
            sys.executable,
            SCRIPT,
            "--out",
            str(out_dir),
            "--n-max",
            "12",
            "--num-eig-vec",
            "4",
            *extra,
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_ingest_end_to_end(ingest_out):
    """The real script runs: filtering, packing, shared stats, layout."""
    from lanczosnet_tpu.data.dataset import load_packed

    out_dir, res = ingest_out
    # 24 train molecules + 1 oversized (filtered by --n-max 12)
    assert "train: 24 molecules" in res.stdout, res.stdout
    assert "val: 8 molecules" in res.stdout
    assert "test: 8 molecules" in res.stdout

    splits = {s: load_packed(out_dir / f"{s}.npz") for s in ("train", "val", "test")}
    train = splits["train"]
    assert train.atom_type.shape == (24, 12)
    assert train.label.shape == (24, 16)
    # 1 merged + 4 bond-type channels in the operator stack, padded to n_max
    assert train.ops.shape == (24, 5, 12, 12)
    assert train.ritz_val is not None and train.ritz_val.shape == (24, 4)
    assert train.ritz_vec.shape == (24, 12, 4)
    # atom ids densely mapped H/C/N/O/F -> 1..5; padding 0
    assert set(np.unique(train.atom_type)) <= set(range(6))
    # val/test must be standardized with the TRAIN split's stats
    for s in ("val", "test"):
        assert splits[s].stats is not None
        np.testing.assert_array_equal(splits[s].stats.mean, train.stats.mean)
        np.testing.assert_array_equal(splits[s].stats.std, train.stats.std)
    # masks reflect true molecule sizes, not the padding
    assert train.mask.sum() < 24 * 12
    assert (train.mask.sum(axis=1) >= 4).all()


def test_ingest_strict_chemistry_gate(stub_path, tmp_path):
    """Unknown element/bond: hard error by default, alias+warn with the flag."""
    res = _run(stub_path, tmp_path / "strict", unknown=True)
    assert res.returncode != 0
    assert "unexpected" in (res.stdout + res.stderr)
    assert "--allow-unknown" in (res.stdout + res.stderr)

    out_dir = tmp_path / "aliased"
    res2 = _run(stub_path, out_dir, "--allow-unknown", unknown=True)
    assert res2.returncode == 0, res2.stdout + res2.stderr
    assert "unknown" in res2.stdout  # aliasing is counted + reported
    assert "train: 25 molecules" in res2.stdout  # the Si mol is kept


def test_train_from_packed_output(ingest_out, tmp_path):
    """The ingest output feeds the ordinary dataset.source: packed path."""
    out_dir, _ = ingest_out

    from lanczosnet_tpu.train.runner import QM8Runner
    from lanczosnet_tpu.utils.config import load_config

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        f"""
exp_name: packed_smoke
runner: QM8Runner
seed: 0
exp_dir: {tmp_path}/exp
dataset:
  source: packed
  n_max: 12
  num_atom: 8
  train_path: {out_dir}/train.npz
  val_path: {out_dir}/val.npz
  test_path: {out_dir}/test.npz
model:
  name: LanczosNet
  num_task: 16
  hidden_dim: [16]
  embed_dim: 16
  short_diffusion_dist: [1, 2]
  long_diffusion_dist: [3, 5]
  num_eig_vec: 4
  spectral_filter_kind: MLP
train:
  optimizer: Adam
  lr: 1.0e-3
  batch_size: 8
  max_epoch: 1
  display_iter: 100
test:
  test_model: null
"""
    )
    cfg = load_config(str(cfg_path))
    runner = QM8Runner(cfg)
    runner.train()
    result = runner.test()
    assert np.isfinite(result["test_mae"])
