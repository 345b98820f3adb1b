"""Install story (reference counterpart: setup.py:1-27 — `pip install`
then run the CLI): pip-install the repo into a CLEAN --prefix tree (a
real non-editable install — stricter than `-e`, which points back at the
checkout and would mask missing package-data), then run a training smoke
via the installed `airgym-tpu` console script from OUTSIDE the repo root,
with the install tree as the only source of the package. Proves the
package works without the implicit cwd-is-repo-root sys.path crutch and
that configs/assets/native-source ship as package data.

Deps are satisfied by the host env (--no-deps/--no-build-isolation: zero
network egress on this host; the host python is itself a venv, so child
venvs cannot see its site-packages).
"""
import glob
import os
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_pip_install_and_cli_smoke(tmp_path):
    prefix = tmp_path / "prefix"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", REPO, "--no-deps",
         "--no-build-isolation", "--quiet", "--prefix", str(prefix)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-3000:]

    site_dirs = glob.glob(str(prefix / "lib" / "python*" / "site-packages"))
    assert site_dirs, list(prefix.rglob("*"))[:20]
    pkg = os.path.join(site_dirs[0], "airgym_tpu")
    # package data made it into the real install
    assert os.path.exists(os.path.join(pkg, "configs", "ppo_hovering.yaml"))
    assert os.path.exists(os.path.join(pkg, "native_src", "px4_cascade.cpp"))
    assert os.path.exists(os.path.join(pkg, "assets", "thin_trees.npy"))
    cli = prefix / "bin" / "airgym-tpu"
    assert cli.exists()

    # tiny 2-epoch hovering config
    with open(os.path.join(REPO, "airgym_tpu", "configs",
                           "ppo_hovering.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["params"]["config"].update(
        {"num_actors": 16, "horizon_length": 8, "minibatch_size": 32,
         "max_epochs": 2, "save_frequency": 0, "mini_epochs": 2})
    tiny = tmp_path / "tiny.yaml"
    tiny.write_text(yaml.safe_dump(cfg))

    # run from a NEUTRAL cwd (not the repo root) via the console script;
    # the installed tree is the only airgym_tpu on the path
    workdir = tmp_path / "elsewhere"
    workdir.mkdir()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = site_dirs[0]
    r = subprocess.run(
        [str(cli), "--train", "--task", "hovering", "--ctl_mode", "rate",
         "--num_envs", "16", "--seed", "1", "--file", str(tiny)],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert "epoch: 2/2" in r.stdout, r.stdout[-2000:]
    # run artifacts land under the cwd, like the reference
    assert (workdir / "runs").is_dir()

    # the packaged default config resolves without --file, from outside
    # the repo (airgym_tpu/configs package data); --play with no
    # checkpoint just evaluates the fresh init
    r = subprocess.run(
        [str(cli), "--play", "--task", "hovering", "--ctl_mode", "rate",
         "--num_envs", "8", "--seed", "1", "--max_steps", "100"],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert "av reward:" in r.stdout, r.stdout[-2000:]
