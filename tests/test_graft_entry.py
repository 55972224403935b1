"""The driver gate (__graft_entry__) must pass from any caller backend."""

import jax
import pytest

import __graft_entry__ as graft


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_inproc_on_conftest_mesh():
    graft._dryrun_multichip_inproc(8)


def test_dryrun_self_provisions_subprocess():
    # The public entry must succeed even though THIS process's backend is
    # whatever conftest configured — it re-execs with its own CPU device
    # count (the round-1 failure mode was depending on the caller's backend).
    graft.dryrun_multichip(2)


def test_entry_compiles_single_device():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape[-1] == 512
