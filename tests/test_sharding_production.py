"""Production-shape sharding (VERDICT r3 #3): the named SLOW test.

Runs the dryrun's production phase — ONE sharded train step and ONE
spatially-sharded 128^3 engine encode at the REAL config (128-dim
features / 64 NOCS bins, f_maps-32 4-level U-Net, 32^3 grid, 6000 input
points, 6000 volume/surface samples; SURVEY.md §2.2,
configs/train_pipeline_default.yaml:58-65) on the virtual 8-device CPU
mesh, equality-checked vs single-device.

This is where GSPMD layout/partitioning surprises live (the toy-width
tests in test_sharding.py never see them — the first run of this phase
caught a knife-edge iso-level artifact at production shapes that 16^3
never triggers). Takes ~10-20 min on this host's CPUs, so it is opt-in:

    GARMENTNETS_SLOW_TESTS=1 pytest tests/test_sharding_production.py

The driver's MULTICHIP artifact runs the same phase every round via
dryrun_multichip(8) (production defaults on at 8 devices), so the check
stays exercised even when the slow test is skipped locally.
"""
import os

import pytest

import __graft_entry__ as graft


@pytest.mark.skipif(
    os.environ.get("GARMENTNETS_SLOW_TESTS") != "1",
    reason="production-shape sharding takes ~10-20 min on CPU; "
           "set GARMENTNETS_SLOW_TESTS=1 (driver covers it via "
           "dryrun_multichip(8))")
def test_dryrun_production_shapes():
    graft.dryrun_multichip(8, production=True)
