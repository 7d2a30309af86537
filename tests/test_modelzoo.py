"""Out-of-box model resolution (realsr_tpu.modelzoo).

The reference ships models in-tree so the default ``-m`` works from a
fresh checkout (reference release.yml:55-66, main.cpp:429); here the
committed graphs + first-use weight synthesis provide the same zero-setup
experience without 66 MB binaries in git (models/README.md).
"""

import os

import pytest

from realsr_tpu import modelzoo
from realsr_tpu.ncnn.synth import make_model_dir
from tests.conftest import TINY_SPEC


def test_resolve_complete_dir(tmp_path):
    d = tmp_path / "models-DF2K"
    make_model_dir(str(d), TINY_SPEC, seed=3)
    got = modelzoo.resolve_model_files(str(d))
    assert got == (str(d / "x4.param"), str(d / "x4.bin"))


def test_unknown_model_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv("REALSR_TPU_MODEL_CACHE", str(tmp_path / "cache"))
    assert modelzoo.resolve_model_files(str(tmp_path / "models-XYZ")) is None


def test_synth_into_incomplete_dir(tmp_path, capsys):
    """A DF2K dir with the graph but no weights gets deterministic
    placeholder weights synthesized next to it, with a stderr notice."""
    d = tmp_path / "models-DF2K"
    make_model_dir(str(d), TINY_SPEC, seed=3)
    os.remove(d / "x4.bin")
    got = modelzoo.resolve_model_files(str(d))
    assert got == (str(d / "x4.param"), str(d / "x4.bin"))
    assert os.path.getsize(d / "x4.bin") > 0
    assert "placeholder weights" in capsys.readouterr().err
    # deterministic: same bytes on re-synthesis
    first = open(d / "x4.bin", "rb").read()
    os.remove(d / "x4.bin")
    modelzoo.resolve_model_files(str(d))
    assert open(d / "x4.bin", "rb").read() == first


def test_readonly_dir_falls_back_to_cache(tmp_path, monkeypatch, capsys):
    """When the graph's dir is not writable, weights go to the user cache
    (chmod can't model this under root, so the write failure is injected)."""
    d = tmp_path / "ro" / "models-DF2K_JPEG"
    make_model_dir(str(d), TINY_SPEC, seed=3)
    os.remove(d / "x4.bin")
    cache = tmp_path / "cache"
    monkeypatch.setenv("REALSR_TPU_MODEL_CACHE", str(cache))
    real_synth = modelzoo._synth_bin

    def synth(parampath, binpath, seed):
        if binpath.startswith(str(d)):
            raise OSError("read-only filesystem")
        return real_synth(parampath, binpath, seed)

    monkeypatch.setattr(modelzoo, "_synth_bin", synth)
    got = modelzoo.resolve_model_files(str(d))
    assert got is not None
    pp, bp = got
    assert str(cache) in bp and os.path.getsize(bp) > 0
    assert open(pp).read() == open(d / "x4.param").read()


def test_fresh_clone_default_model(tmp_path, monkeypatch, capsys):
    """The default ``-m models-DF2K_JPEG`` resolves via the repo-style
    ``models/`` dir from any CWD (install-root rule) and synthesizes the
    missing weights there."""
    root = tmp_path / "clone"
    mdir = root / "models" / "models-DF2K_JPEG"
    mdir.mkdir(parents=True)
    # committed graph, no weights — a fresh clone
    make_model_dir(str(mdir), TINY_SPEC, seed=1)
    os.remove(mdir / "x4.bin")
    monkeypatch.setattr(
        modelzoo, "install_root", lambda: str(root / "realsr_tpu")
    )
    monkeypatch.chdir(tmp_path)  # CWD-relative lookup must miss
    got = modelzoo.resolve_model_files("models-DF2K_JPEG")
    assert got == (str(mdir / "x4.param"), str(mdir / "x4.bin"))
    assert os.path.getsize(mdir / "x4.bin") > 0


def test_ensure_model_bridge_contract(tmp_path):
    d = tmp_path / "models-DF2K"
    make_model_dir(str(d), TINY_SPEC, seed=3)
    out = modelzoo.ensure_model(str(d), 4)
    assert out.split("\n") == [str(d / "x4.param"), str(d / "x4.bin")]
    with pytest.raises(FileNotFoundError):
        modelzoo.ensure_model(str(tmp_path / "models-NOPE"), 4)


def test_committed_graphs_parse():
    """The repo's committed models/*/x4.param are the real 999-layer
    RRDBNet graph (SURVEY.md §2.8 counts)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from realsr_tpu.ncnn.param import parse_param_file

    for name in ("models-DF2K", "models-DF2K_JPEG"):
        p = os.path.join(repo, "models", name, "x4.param")
        g = parse_param_file(p)
        assert g.layer_count == 999 and g.blob_count == 1782


def test_first_param_dir_wins_over_later_complete(tmp_path, monkeypatch, capsys):
    """First-match path semantics (filesystem_utils.h:167-173): a graph the
    user put first in the chain is used (weights synthesized next to it)
    even when a complete pair exists further down (e.g. a stale cache)."""
    user = tmp_path / "models-DF2K"
    make_model_dir(str(user), TINY_SPEC, seed=3)
    os.remove(user / "x4.bin")
    cache = tmp_path / "cache"
    stale = cache / "models-DF2K"
    make_model_dir(str(stale), TINY_SPEC, seed=9)
    monkeypatch.setenv("REALSR_TPU_MODEL_CACHE", str(cache))
    got = modelzoo.resolve_model_files(str(user))
    assert got == (str(user / "x4.param"), str(user / "x4.bin"))
