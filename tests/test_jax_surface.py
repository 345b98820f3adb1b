"""Import-surface probes for version-sensitive jax APIs (VERDICT r4 #8).

pyproject.toml declares the jax range the package installs against, but
two hot paths lean on surfaces OUTSIDE jax's stable API:

  * ``jax.experimental.layout.{Format, Layout}`` + ``Array.format`` +
    ``Layout.major_to_minor`` — rl/ppo.py make_train_epoch pins donation
    layouts with these (the buffer-donation fast path for the big
    env-state/obs arrays);
  * the ``jax_num_cpu_devices`` config option — __graft_entry__'s
    dryrun_multichip subprocess bootstraps a virtual CPU mesh with it.

When a jax upgrade moves or drops one of these, these tests fail with a
message naming the dependent feature, instead of a deep traceback in the
middle of training. If they fail on a new jax: fix the call sites AND
re-tighten the jax bound in pyproject.toml to cover the new surface.
"""
import jax
import jax.numpy as jnp
import pytest


def test_declared_jax_range_matches_probed_surface():
    """The probes below validate THIS jax; pyproject must not claim a
    range wider than what any jax we probed can satisfy structurally.
    (Validated minors: 0.9.x — see pyproject.toml comment.)"""
    import os
    major, minor = (int(x) for x in jax.__version__.split(".")[:2])
    assert (major, minor) >= (0, 9), (
        f"jax {jax.__version__} is below the declared floor 0.9 — the "
        f"layout-donation and virtual-CPU-mesh surfaces were never "
        f"validated there (pyproject.toml dependencies)")
    here = os.path.join(os.path.dirname(__file__), "..", "pyproject.toml")
    with open(here) as f:
        toml = f.read()
    assert '"jax>=0.9,<1.0"' in toml, (
        "pyproject.toml's jax bound changed — update this probe AND "
        "re-validate the experimental surfaces against the new range")


def test_experimental_layout_surface():
    """rl/ppo.py:make_train_epoch donation-layout pinning."""
    try:
        from jax.experimental.layout import Format, Layout
    except ImportError:
        pytest.fail(
            "jax.experimental.layout.{Format, Layout} is gone on jax "
            f"{jax.__version__}: rl/ppo.py make_train_epoch's donation "
            "layout pinning depends on it — port the call site or pin "
            "jax (pyproject.toml)")
    x = jnp.zeros((2, 3, 4))
    fmt = getattr(x, "format", None)
    assert fmt is not None, (
        f"Array.format disappeared on jax {jax.__version__} — "
        "make_train_epoch reads the actual device layout from it")
    if fmt.layout is not None:
        assert hasattr(fmt.layout, "major_to_minor"), (
            f"Layout.major_to_minor disappeared on jax {jax.__version__}")
        Format(Layout(fmt.layout.major_to_minor), x.sharding)
    Format(None, x.sharding)


def test_num_cpu_devices_flag_exists():
    """__graft_entry__.dryrun_multichip's subprocess sets this before
    backend init to build the N-device virtual CPU mesh."""
    assert hasattr(jax.config, "jax_num_cpu_devices"), (
        f"the jax_num_cpu_devices config option is gone on jax "
        f"{jax.__version__} — dryrun_multichip's virtual-mesh bootstrap "
        "(__graft_entry__.py) depends on it")
