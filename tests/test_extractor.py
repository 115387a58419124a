"""NanoAOD extractor: output writing + graceful uproot gating
(reference parity: `scripts/extract_cms_nanoaod.py`)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import extract_cms_nanoaod as ex


def test_write_outputs(tmp_path):
    feats = {"nJet": np.array([1, 2, 3]), "HT": np.array([10.0, 20.0, 30.0])}
    prefix = str(tmp_path / "out")
    ex.write_outputs(feats, prefix, fmt="both")
    npz = np.load(prefix + ".npz")
    np.testing.assert_array_equal(npz["nJet"], feats["nJet"])
    lines = open(prefix + ".csv").read().strip().splitlines()
    assert lines[0] == "nJet,HT"
    assert len(lines) == 4


def test_uproot_gating(tmp_path, monkeypatch):
    """The extractor degrades to a clear error without uproot.  uproot's
    absence is simulated by poisoning the import, so this runs (no skip)
    whether or not the environment ships uproot."""
    import builtins

    real_import = builtins.__import__

    def no_uproot(name, *a, **kw):
        if name == "uproot":
            raise ImportError("uproot disabled for test")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_uproot)
    with pytest.raises(RuntimeError, match="uproot is required"):
        ex.extract_event_level(str(tmp_path / "nope.root"))
