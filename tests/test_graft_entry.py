import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args) if not hasattr(fn, "lower") else fn(*args)
    corr = np.asarray(out.correction)
    assert corr.shape == (4, 4)
    assert np.isfinite(corr).all()
    assert 0.0 <= float(out.overlap_percent) <= 100.0


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    ge.dryrun_multichip(4)


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)
