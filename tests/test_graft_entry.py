"""Guard tests for the driver entry points (__graft_entry__) so API
changes in the trainer/task surface are caught by the suite."""
import jax
import jax.numpy as jnp
import pytest


def test_entry_compiles_small(monkeypatch):
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    obs, reward, value = out
    assert obs.shape[0] == reward.shape[0] == value.shape[0]
    assert bool(jnp.all(jnp.isfinite(reward)))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)
