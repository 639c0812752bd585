"""Driver contract: entry() compiles single-chip; dryrun_multichip(8) jits and
executes one full sharded training step on the virtual CPU mesh."""

import jax
import pytest

import __graft_entry__ as graft


def test_entry_traces():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (216, 384, 3)


def test_dryrun_multichip():
    assert jax.device_count() >= 8
    graft.dryrun_multichip(8)
